"""Persistence of precomputed settings (checkpoint/resume analogue).

The reference persists only its trusted-setup JSON (SURVEY.md section 5,
"Checkpoint/resume: none"); here the expensive precomputes — the CRS in
device layout and the FK20 xExtFFT tables (chunkLen G1-FFTs at init,
kzg.go:103-114) — round-trip through npz so a serving process can skip
re-deriving them.
"""

from __future__ import annotations

import numpy as np

from ..curve.weierstrass import JacobianPoint
from ..ntt.domain import FFTSettings
from .settings import KZGSettings


def _pt_to_np(p: JacobianPoint) -> dict:
    return {"x": np.asarray(p.x), "y": np.asarray(p.y), "z": np.asarray(p.z)}


def _pt_from_np(d, prefix) -> JacobianPoint:
    import jax.numpy as jnp

    return JacobianPoint(
        jnp.asarray(d[f"{prefix}_x"]),
        jnp.asarray(d[f"{prefix}_y"]),
        jnp.asarray(d[f"{prefix}_z"]),
    )


def save_kzg_settings(path: str, ks: KZGSettings) -> None:
    g2 = np.asarray(
        [[c for pair in pt for c in pair] for pt in ks.secret_g2_affine],
        dtype=object,
    )
    # store G2 affine ints as big-endian bytes (object arrays don't npz)
    g2b = np.zeros((len(ks.secret_g2_affine), 4, 48), dtype=np.uint8)
    for i, ((x0, x1), (y0, y1)) in enumerate(ks.secret_g2_affine):
        for j, v in enumerate((x0, x1, y0, y1)):
            g2b[i, j] = list(v.to_bytes(48, "big"))
    del g2
    pt = _pt_to_np(ks.secret_g1)
    np.savez_compressed(
        path,
        max_scale=ks.fs.max_scale,
        s1_x=pt["x"], s1_y=pt["y"], s1_z=pt["z"],
        g2_affine=g2b,
    )


def load_kzg_settings(path: str) -> KZGSettings:
    z = np.load(path)
    fs = FFTSettings(int(z["max_scale"]))
    s1 = _pt_from_np(z, "s1")
    g2 = [
        (
            (int.from_bytes(bytes(r[0]), "big"),
             int.from_bytes(bytes(r[1]), "big")),
            (int.from_bytes(bytes(r[2]), "big"),
             int.from_bytes(bytes(r[3]), "big")),
        )
        for r in z["g2_affine"]
    ]
    return KZGSettings(fs, s1, g2)


def save_fk20_single(path: str, fk) -> None:
    pt = _pt_to_np(fk.x_ext_fft)
    np.savez_compressed(path, n2=fk.n2, xe_x=pt["x"], xe_y=pt["y"],
                        xe_z=pt["z"])


def load_fk20_single(path: str, ks: KZGSettings):
    from ..fk20.single import FK20SingleSettings

    z = np.load(path)
    fk = FK20SingleSettings.__new__(FK20SingleSettings)
    fk.ks = ks
    fk.n2 = int(z["n2"])
    fk.n = fk.n2 // 2
    fk.x_ext_fft = _pt_from_np(z, "xe")
    fk._init_jits()
    return fk


def save_fk20_multi(path: str, fkm) -> None:
    pt = _pt_to_np(fkm.x_ext_fft_files)
    np.savez_compressed(path, n2=fkm.n2, chunk_len=fkm.chunk_len,
                        xf_x=pt["x"], xf_y=pt["y"], xf_z=pt["z"])


def load_fk20_multi(path: str, ks: KZGSettings):
    from ..fk20.multi import FK20MultiSettings

    z = np.load(path)
    fkm = FK20MultiSettings.__new__(FK20MultiSettings)
    fkm.ks = ks
    fkm.n2 = int(z["n2"])
    fkm.chunk_len = int(z["chunk_len"])
    fkm.n = fkm.n2 // 2
    fkm.k = fkm.n // fkm.chunk_len
    fkm.x_ext_fft_files = _pt_from_np(z, "xf")
    fkm._init_jits()
    return fkm
