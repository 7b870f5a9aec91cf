from .mesh import make_mesh  # noqa: F401
from .fft_sharded import fft_sharded  # noqa: F401
from .msm_sharded import lin_comb_g1_sharded  # noqa: F401
