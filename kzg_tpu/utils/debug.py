"""Debug dumpers (reference: debug.go:9-27, DebugG1s bls/bls_kilic.go:160).

Print canonical integer values of device batches for test debugging.
"""

from __future__ import annotations

import numpy as np


def fr_str(x) -> str:
    """Canonical decimal string of a single Fr element
    (reference: FrStr)."""
    from ..field import fr

    return str(int(fr.to_int(np.asarray(x))[()]))


def debug_frs(msg: str, values) -> None:
    """Dump an Fr batch (reference: debugFrs, debug.go:9-16)."""
    from ..field import fr

    ints = fr.to_int(values)
    print(f"---{msg}---")
    for i, v in enumerate(np.atleast_1d(ints)):
        print(f"#{i:4d}: {v}")


def debug_g1s(msg: str, points) -> None:
    """Dump a G1 point batch as affine ints / compressed hex
    (reference: DebugG1s, bls/bls_kilic.go:160-166)."""
    from ..curve import g1, serialization

    affs = g1.to_affine_ints(points)
    if not isinstance(affs, list):
        affs = [affs]
    print(f"---{msg}---")
    for i, a in enumerate(affs):
        print(f"#{i:4d}: {serialization.compress_g1(a).hex()}")
