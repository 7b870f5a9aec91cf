"""kzg_tpu: a TPU-native BLS12-381 KZG / FFT framework built on JAX/XLA/Pallas.

Brand-new design with the full capability surface of protolambda/go-kzg
(see SURVEY.md): Fr/Fp fixed-limb Montgomery arithmetic vectorized over the
batch axis, radix-2 (I)FFT over the scalar field and over G1, DAS extension,
KZG commitments with single/multi (coset) proofs, FK20 amortized proofs,
zero-polynomial construction, erasure-coded recovery, and the EIP-4844 blob
API. Sharded execution over a `jax.sharding.Mesh` lives in `kzg_tpu.parallel`.
"""

__version__ = "0.1.0"

from . import field  # noqa: F401
from . import poly  # noqa: F401
from . import ntt  # noqa: F401
from . import curve  # noqa: F401
from . import kzg  # noqa: F401
from . import fk20  # noqa: F401
from . import das  # noqa: F401
from . import eth  # noqa: F401
from . import utils  # noqa: F401
