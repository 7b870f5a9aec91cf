"""Settings persistence roundtrips (checkpoint/resume analogue)."""

import jax.numpy as jnp

from kzg_tpu.curve import g1
from kzg_tpu.field import fr
from kzg_tpu.fk20 import FK20MultiSettings, FK20SingleSettings
from kzg_tpu.kzg import (
    load_fk20_multi,
    load_fk20_single,
    load_kzg_settings,
    save_fk20_multi,
    save_fk20_single,
    save_kzg_settings,
)

COEFFS = [1, 2, 3, 4, 7, 8, 9, 10]


def test_kzg_settings_roundtrip(kzg_env, tmp_path):
    fs, ks = kzg_env
    p = str(tmp_path / "ks.npz")
    save_kzg_settings(p, ks)
    ks2 = load_kzg_settings(p)
    coeffs = jnp.asarray(fr.from_int(COEFFS))
    assert bool(g1.eq(ks.commit_to_poly(coeffs), ks2.commit_to_poly(coeffs)))
    assert ks2.secret_g2_affine == ks.secret_g2_affine


def test_fk20_single_roundtrip(kzg_env, tmp_path):
    fs, ks = kzg_env
    fk = FK20SingleSettings(ks, 16)
    p = str(tmp_path / "fk.npz")
    save_fk20_single(p, fk)
    fk2 = load_fk20_single(p, ks)
    coeffs = jnp.asarray(fr.from_int(COEFFS))
    p1 = fk.fk20_single(coeffs)
    p2 = fk2.fk20_single(coeffs)
    assert bool(jnp.all(g1.eq(p1, p2)))


def test_fk20_multi_roundtrip(kzg_env, tmp_path):
    fs, ks = kzg_env
    fkm = FK20MultiSettings(ks, 16, 2)
    p = str(tmp_path / "fkm.npz")
    save_fk20_multi(p, fkm)
    fkm2 = load_fk20_multi(p, ks)
    coeffs = jnp.asarray(fr.from_int(COEFFS))
    p1 = fkm.fk20_multi(coeffs)
    p2 = fkm2.fk20_multi(coeffs)
    assert bool(jnp.all(g1.eq(p1, p2)))


def test_debug_helpers(capsys):
    from kzg_tpu.utils import debug

    vals = jnp.asarray(fr.from_int([5, 6]))
    debug.debug_frs("vals", vals)
    out = capsys.readouterr().out
    assert "---vals---" in out and "5" in out and "6" in out
    assert debug.fr_str(jnp.asarray(fr.from_int(42))) == "42"
    debug.debug_g1s("gen", g1.generator((1,)))
    out = capsys.readouterr().out
    assert "97f1d3a7" in out
