"""Distributed Fr FFT over a device mesh axis.

The reference caps out at single-core recursion (fft_fr.go:30-53); this is
the new sequence-parallel design (SURVEY.md section 7 "sharded NTT"):

  natural-order input, sharded in contiguous blocks over D devices
    1. log2(D) decimation-in-frequency butterfly stages whose span crosses
       shards: each is one `ppermute` block exchange + a fused local
       butterfly (the partner block lives at the same local offsets)
    2. an independent local FFT of the per-shard block (the remaining
       stages never leave the shard)
    3. one distributed transpose (`all_to_all` + static local permutes)
       that converts the DIF frequency-residue layout back to the natural
       contiguous-block sharding

Output is the natural-order DFT, bit-identical to the single-device path.

`fr_fft_graph` is the traceable per-shard body, reusable inside larger
shard_map programs (the sharded FK20 pipeline batches it over the l
Toeplitz vectors); `fft_sharded` wraps it as a standalone jit. The whole
program is ONE jit per (mesh, width, direction): an un-jitted shard_map
executes eagerly — one tiny dispatch and one tiny XLA compile per
primitive per device, thousands per call (this was the round-2
multichip-dryrun compile storm). Domain/twiddle vectors enter as traced
arguments, so the compiled program is shared across FFTSettings
instances of equal max_width and survives in the persistent cache.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..field import fr
from ..ntt.bitrev import bit_reversal_indices
from ..ntt.domain import FFTSettings
from ..ntt.fft_fr import _fft_core, take_strided


def cross_stage_spans(n: int, local: int) -> tuple:
    """Butterfly spans h = n/2 .. local that cross shard boundaries."""
    spans = []
    h = n // 2
    while h >= local:
        spans.append(h)
        h //= 2
    return tuple(spans)


def stage_twiddle_tables(fs: FFTSettings, roots, n: int, local: int):
    """Per-cross-stage twiddle vectors: stage h needs w^(r*n/(2h)) for
    r < h, i.e. the root table strided by max_width/(2h). take_strided
    is a reshape+slice (gather-free) and folds into the enclosing jit."""
    tables = []
    for h in cross_stage_spans(n, local):
        stride = fs.max_width // (2 * h)
        tables.append(take_strided(roots, h, stride))
    return tuple(tables)


def fr_fft_graph(block, stage_tables, roots, *, axis: str, D: int, n: int,
                 max_width: int, inverse: bool, rev_d):
    """Traceable per-shard FFT body (call inside shard_map over `axis`).

    block: uint32[..., local, 16] — this shard's contiguous block of the
    (..., n, 16) batch (leading axes are independent transforms). Returns
    the same shape, natural order, same sharding.

    The inverse transform scales by the GLOBAL 1/n inside the local
    (length n/D) IFFT — inv_log2 = log2(n) is threaded explicitly, never
    derived from the local block shape (round-5 ADVICE fix).
    """
    local = n // D
    inv_log2 = n.bit_length() - 1 if inverse else None
    s = lax.axis_index(axis)
    x = block
    for h, table in zip(cross_stage_spans(n, local), stage_tables):
        g = h // local            # shard distance of the partner
        m = 2 * h // local        # shards per butterfly block
        s_mod = s % m
        role_b = s_mod >= g
        perm = [(i, i ^ g) for i in range(D)]
        px = lax.ppermute(x, axis, perm)
        # role a (lower half): out = a + b = x + px
        a_out = fr.add(x, px)
        # role b (upper half): out = (a - b) * w^(r'), r' = base + t
        base = jnp.maximum(s_mod - g, 0) * local
        tw = lax.dynamic_slice_in_dim(table, base, local, axis=0)
        b_out = fr.mul(fr.sub(px, x), tw)
        x = jnp.where(role_b, b_out, a_out)
    # local FFT of the shard-resident subproblem (natural order, with
    # the global 1/n applied here when inverting)
    x = _fft_core(x, roots, inv_log2, max_width=max_width)
    # distributed transpose: x[t] = X[t*D + rev_d(s)] -> natural blocks
    c = local // D
    lead = x.shape[:-2]
    la = len(lead)
    xr = x.reshape(lead + (D, c, fr.N_LIMBS))
    recv = lax.all_to_all(xr, axis, split_axis=la, concat_axis=la)
    recv = jnp.take(recv, rev_d, axis=la)  # source shard -> frequency bit
    out = jnp.moveaxis(recv, la, la + 1).reshape(
        lead + (local, fr.N_LIMBS))
    return out


def check_sharded_shape(n: int, D: int, max_width: int) -> None:
    if n % D != 0:
        raise ValueError("n must be divisible by the mesh axis size")
    if n // D < D:
        # the distributed transpose reshapes the local block into (D, c):
        # each shard must hold at least one element per target shard
        raise ValueError("need local >= D for the distributed transpose")
    if n & (n - 1) != 0:
        raise ValueError("n must be a power of two")
    if n > max_width:
        raise ValueError("n larger than the FFT domain")


@functools.lru_cache(maxsize=None)
def _fft_sharded_fn(mesh: Mesh, axis: str, lead_rank: int, n: int,
                    max_width: int, inverse: bool):
    D = mesh.shape[axis]
    rev_d = jnp.asarray(bit_reversal_indices(D))
    lead = (None,) * lead_rank

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(*lead, axis, None), P(None, None), P(None, None)),
        out_specs=P(*lead, axis, None),
        check_rep=False,
    )
    def run(block, stage_tables, roots):
        return fr_fft_graph(block, stage_tables, roots, axis=axis, D=D,
                            n=n, max_width=max_width, inverse=inverse,
                            rev_d=rev_d)

    return jax.jit(run)


def fft_sharded(fs: FFTSettings, vals, mesh: Mesh, axis: str = "elem",
                inverse: bool = False):
    """(I)FFT of uint32[..., n, 16] sharded over `axis` in contiguous
    blocks of the element dimension (leading axes batch independent
    transforms and stay unsharded).

    Requires n = D * local with local >= D (both powers of two). Returns
    the natural-order transform with the same sharding.
    """
    n = vals.shape[-2]
    D = mesh.shape[axis]
    check_sharded_shape(n, D, fs.max_width)
    roots = (fs.reverse_roots_of_unity if inverse
             else fs.expanded_roots_of_unity)
    if D == 1:
        return _fft_core(
            vals, roots, n.bit_length() - 1 if inverse else None,
            max_width=fs.max_width)
    tables = stage_twiddle_tables(fs, roots, n, n // D)
    run = _fft_sharded_fn(mesh, axis, vals.ndim - 2, n, fs.max_width,
                          inverse)
    return run(vals, tables, roots)
