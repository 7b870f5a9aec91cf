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

The whole program is ONE jit per (mesh, width, direction): an un-jitted
shard_map executes eagerly — one tiny dispatch and one tiny XLA compile
per primitive per device, thousands per call (this was the round-2
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


@functools.lru_cache(maxsize=None)
def _fft_sharded_fn(mesh: Mesh, axis: str, n: int, max_width: int,
                    inverse: bool):
    D = mesh.shape[axis]
    local = n // D
    rev_d = jnp.asarray(bit_reversal_indices(D))
    # static stage plan: cross-shard butterfly spans h = n/2 .. local
    spans = []
    h = n // 2
    while h >= local:
        spans.append(h)
        h //= 2

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None), P(None, None), P(None, None), P(None)),
        out_specs=P(axis, None),
        check_rep=False,
    )
    def run(block, stage_tables, roots, inv_n):
        # block: (local, 16) per shard; stage_tables: tuple of per-stage
        # twiddle vectors; roots: full domain vector; inv_n: (16,) 1/n
        s = lax.axis_index(axis)
        x = block
        for h, table in zip(spans, stage_tables):
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
        x = _fft_core(x, roots, inv_n if inverse else None,
                      max_width=max_width)
        # distributed transpose: x[t] = X[t*D + rev_d(s)] -> natural blocks
        c = local // D
        xr = x.reshape(D, c, fr.N_LIMBS)
        recv = lax.all_to_all(xr, axis, split_axis=0, concat_axis=0)
        recv = jnp.take(recv, rev_d, axis=0)  # source shard -> frequency bit
        out = recv.transpose(1, 0, 2).reshape(local, fr.N_LIMBS)
        return out

    return jax.jit(run)


def fft_sharded(fs: FFTSettings, vals, mesh: Mesh, axis: str = "elem",
                inverse: bool = False):
    """(I)FFT of uint32[n, 16] sharded over `axis` in contiguous blocks.

    Requires n = D * local with local >= D (both powers of two). Returns
    the natural-order transform with the same sharding.
    """
    n = vals.shape[0]
    D = mesh.shape[axis]
    if n % D != 0:
        raise ValueError("n must be divisible by the mesh axis size")
    local = n // D
    if local < D:
        raise ValueError("need local >= D for the distributed transpose")
    if n & (n - 1) != 0:
        raise ValueError("n must be a power of two")
    if n > fs.max_width:
        raise ValueError("n larger than the FFT domain")
    roots = (fs.reverse_roots_of_unity if inverse
             else fs.expanded_roots_of_unity)
    inv_n = fs.inv_length(n)
    if D == 1:
        return _fft_core(vals, roots, inv_n if inverse else None,
                         max_width=fs.max_width)

    # Static per-stage twiddle tables: stage h needs w^(r*n/(2h)) for
    # r < h, i.e. the root table strided by max_width/(2h). take_strided
    # is a reshape+slice (gather-free) and folds into the jit below.
    stage_tables = []
    h = n // 2
    while h >= local:
        stride = fs.max_width // (2 * h)
        stage_tables.append(take_strided(roots, h, stride))
        h //= 2

    run = _fft_sharded_fn(mesh, axis, n, fs.max_width, inverse)
    return run(vals, tuple(stage_tables), roots, inv_n)
