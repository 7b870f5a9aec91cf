from .zero_poly import zero_poly_via_multiplication  # noqa: F401
from .recovery import (  # noqa: F401
    erasure_code_recover,
    recover_poly_from_samples,
    shift_poly,
    unshift_poly,
)
