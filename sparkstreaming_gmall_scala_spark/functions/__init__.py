from . import dates, money, text, vectors

__all__ = ["dates", "money", "text", "vectors"]
