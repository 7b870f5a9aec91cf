from . import fp2, g1, g2, msm, pairing, serialization  # noqa: F401
from .fft_g1 import fft_g1, reverse_bit_order_g1  # noqa: F401
from .msm import lin_comb_g1, sum_g1  # noqa: F401
from .weierstrass import CurveOps, JacobianPoint  # noqa: F401
