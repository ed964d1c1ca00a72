from zkarray.ff import fp

__all__ = ["fp"]
