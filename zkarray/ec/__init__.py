from zkarray.ec import sw
from zkarray.ec.sw import AffinePoints, JacobianPoints, SWCurveSpec, XYZZPoints

__all__ = ["sw", "AffinePoints", "JacobianPoints", "SWCurveSpec", "XYZZPoints"]
