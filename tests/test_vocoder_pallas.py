"""Fused vocoder kernel (ops/vocoder_pallas.py) vs the XLA path.

Runs the Pallas kernel in interpreter mode on CPU and checks it against the
unfused ops it replaces (blocks.adain_res_block1_apply's XLA path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from styletts2_tpu.nn import blocks as B
from styletts2_tpu.nn import layers as L
from styletts2_tpu.ops import vocoder_pallas as VP


def _xla_reference(x, scale, shift, alpha, w, bias, dilation, n_valid,
                   use_snake=True):
    t = x.shape[1]
    z = x.astype(jnp.float32) * scale[:, None, :] + shift[:, None, :]
    z = z.astype(x.dtype)
    if use_snake:
        a = alpha.reshape(1, 1, -1).astype(z.dtype)
        sn = jnp.sin(a * z)
        z = z + (1.0 / a) * (sn * sn)
    mask = jnp.arange(t)[None, :] < n_valid[:, None]
    z = jnp.where(mask[..., None], z, 0)
    k = w.shape[2]
    pad = dilation * (k - 1) // 2
    return L.conv1d_apply({"weight": w, "bias": bias}, z, padding=pad,
                          dilation=dilation)


@pytest.mark.parametrize("c,k,dilation,t", [(64, 11, 5, 400), (32, 3, 1, 600),
                                            (128, 7, 3, 2000)])
def test_fused_kernel_matches_xla(c, k, dilation, t):
    rng = np.random.default_rng(0)
    b = 2
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal((b, c)) * 0.5 + 1.0, jnp.float32)
    shift = jnp.asarray(rng.standard_normal((b, c)) * 0.1, jnp.float32)
    alpha = jnp.asarray(np.abs(rng.standard_normal(c)) + 0.5, jnp.float32)
    w = jnp.asarray(rng.standard_normal((c, c, k)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(c) * 0.01, jnp.float32)
    n_valid = jnp.asarray([t, t - 137], jnp.int32)

    got = VP.fused_ada_snake_conv(x, scale, shift, alpha, w, bias, dilation,
                                  n_valid, interpret=True)
    assert got is not None
    want = _xla_reference(x, scale, shift, alpha, w, bias, dilation, n_valid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-3)


def test_adain_affine_collapse_matches_fused_apply():
    """scale/shift collapse == adain_1d_act_apply (the XLA fused op)."""
    rng = np.random.default_rng(1)
    b, t, c, sd = 2, 80, 48, 16
    key = jax.random.PRNGKey(0)
    p = L.adain_1d_init(key, sd, c)
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    s = jnp.asarray(rng.standard_normal((b, sd)), jnp.float32)
    mask = jnp.arange(t)[None, :] < jnp.asarray([t, t - 17])[:, None]
    alpha = jnp.asarray(np.abs(rng.standard_normal(c)) + 0.5, jnp.float32)

    scale, shift = B._adain_affine(p, x, s, mask)
    z = x * scale[:, None, :] + shift[:, None, :]
    a = alpha.reshape(1, 1, -1)
    z = z + (1.0 / a) * jnp.sin(a * z) ** 2
    z = jnp.where(mask[..., None], z, 0.0)

    want = L.adain_1d_act_apply(p, x, s, mask, act="snake",
                                alpha=alpha.reshape(1, 1, -1))
    np.testing.assert_allclose(np.asarray(z), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("c,f,k,prefold", [(32, 4, 11, False),
                                           (64, 2, 7, False),
                                           (32, 4, 3, True),
                                           (32, 4, 11, True)])
def test_folded_block_matches_unfolded(c, f, k, prefold):
    """Time-folded (space-to-depth) residual block == unfolded block.

    The fold is exact math (same taps, same zero pads), so the only
    difference is matmul summation order. `prefold` additionally covers
    the host-precomputed 'wfold' weights (decoder.prefold_generator_params
    path)."""
    rng = np.random.default_rng(4)
    b, t, sd = 2, 240, 16
    key = jax.random.PRNGKey(5)
    p = B.adain_res_block1_init(key, c, k, (1, 3, 5), sd)
    from styletts2_tpu.convert import fuse_weight_norm
    p = fuse_weight_norm({"m": p})["m"]
    if prefold:
        for di, d in enumerate((1, 3, 5)):
            for convs, dd in (("convs1", d), ("convs2", 1)):
                cp = p[convs][str(di)]
                cp["wfold"] = L.fold_conv1d_weight_np(
                    np.asarray(cp["weight"]), f, dd)
                cp["bfold"] = np.tile(np.asarray(cp["bias"]), f)
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    s = jnp.asarray(rng.standard_normal((b, sd)), jnp.float32)
    n_valid = jnp.asarray([t, t - 3 * f], jnp.int32)  # multiple of f
    mask = jnp.arange(t)[None, :] < n_valid[:, None]

    want = B.adain_res_block1_apply(p, x, s, k, (1, 3, 5), mask,
                                    n_valid=n_valid, fold=1)
    got = B.adain_res_block1_apply(p, x, s, k, (1, 3, 5), mask,
                                   n_valid=n_valid, fold=f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-3)
    # mask=None must mean UNMASKED stats in both paths (n_valid alone only
    # gates the fold) — a semantics mismatch here corrupts nothing in the
    # decoder (which always passes both) but breaks API equivalence
    want = B.adain_res_block1_apply(p, x, s, k, (1, 3, 5), None,
                                    n_valid=n_valid, fold=1)
    got = B.adain_res_block1_apply(p, x, s, k, (1, 3, 5), None,
                                   n_valid=n_valid, fold=f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-3)


def test_fold_conv1d_weight_matches_conv():
    """Folded dense conv == plain dilated SAME conv."""
    rng = np.random.default_rng(5)
    b, t, c, k, d, f = 1, 96, 32, 7, 5, 4
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((c, c, k)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(c) * 0.01, jnp.float32)
    want = L.conv1d_apply({"weight": w, "bias": bias}, x,
                          padding=d * (k - 1) // 2, dilation=d)
    x_f = x.reshape(b, t // f, f * c)
    got = L.conv1d_folded_apply({"weight": w, "bias": bias}, x_f, f, d)
    got = got.reshape(b, t, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("c,k,dilation", [(32, 11, 5), (32, 7, 3),
                                          (64, 11, 5), (64, 3, 1)])
def test_fused_kernel_folded_matches_xla(c, k, dilation):
    """Time-folded kernel invocation (w_is_hio folded weights on a
    (T/f, 128) tensor — the under-128-lane engine path) == the plain
    dilated conv on the unfolded tensor."""
    rng = np.random.default_rng(7)
    b, t = 2, 1920
    f = 128 // c
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal((b, c)) * 0.5 + 1.0, jnp.float32)
    shift = jnp.asarray(rng.standard_normal((b, c)) * 0.1, jnp.float32)
    alpha = jnp.asarray(np.abs(rng.standard_normal(c)) + 0.5, jnp.float32)
    w = jnp.asarray(rng.standard_normal((c, c, k)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(c) * 0.01, jnp.float32)
    n_valid = jnp.asarray([t, t - 16 * f], jnp.int32)  # multiples of f

    want = _xla_reference(x, scale, shift, alpha, w, bias, dilation, n_valid)

    wfold = L.fold_conv1d_weight_np(np.asarray(w), f, dilation)
    bfold = jnp.asarray(np.tile(np.asarray(bias), f))
    x_f = x.reshape(b, t // f, f * c)
    got_f = VP.fused_ada_snake_conv(
        x_f, jnp.tile(scale, (1, f)), jnp.tile(shift, (1, f)),
        jnp.tile(alpha, f), jnp.asarray(wfold), bfold, 1, n_valid // f,
        w_is_hio=True, interpret=True)
    assert got_f is not None
    got = got_f.reshape(b, t, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-3)


def test_adain_affine_folded_matches_unfolded():
    """_adain_affine_folded (phase-merged stats on the folded layout) ==
    _adain_affine on the unfolded tensor, tiled per phase."""
    rng = np.random.default_rng(9)
    b, t, c, sd, f = 2, 96, 32, 16, 4
    key = jax.random.PRNGKey(11)
    p = L.adain_1d_init(key, sd, c)
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    s = jnp.asarray(rng.standard_normal((b, sd)), jnp.float32)
    n_valid = jnp.asarray([t, t - 2 * f], jnp.int32)
    mask = jnp.arange(t)[None, :] < n_valid[:, None]

    scale, shift = B._adain_affine(p, x, s, mask)
    x_f = x.reshape(b, t // f, f * c)
    scale_f, shift_f = B._adain_affine_folded(p, x_f, s, n_valid // f, f)
    np.testing.assert_allclose(np.asarray(scale_f),
                               np.asarray(jnp.tile(scale, (1, f))),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(shift_f),
                               np.asarray(jnp.tile(shift, (1, f))),
                               atol=1e-5, rtol=1e-5)


def test_block_prefers_pallas_only_on_tpu():
    """On CPU the gate must route to the XLA path (no pallas lowering)."""
    rng = np.random.default_rng(2)
    b, t, c, sd = 1, 200, 32, 16
    key = jax.random.PRNGKey(3)
    p = B.adain_res_block1_init(key, c, 3, (1, 3, 5), sd)
    from styletts2_tpu.convert import fuse_weight_norm
    p = fuse_weight_norm({"m": p})["m"]
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    s = jnp.asarray(rng.standard_normal((b, sd)), jnp.float32)
    n_valid = jnp.asarray([150], jnp.int32)
    mask = jnp.arange(t)[None, :] < n_valid[:, None]
    out = B.adain_res_block1_apply(p, x, s, 3, (1, 3, 5), mask,
                                   n_valid=n_valid)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("t,tile_splits", [(400, False), (2000, True)])
def test_fused_kernel_residual_and_stats(t, tile_splits):
    """residual epilogue == separate add; out_stats partial sums == masked
    sum/sumsq of the output (multi-tile case exercises per-tile blocks)."""
    rng = np.random.default_rng(7)
    b, c, k, dilation = 2, 128, 7, 3
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    res = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal((b, c)) * 0.5 + 1.0, jnp.float32)
    shift = jnp.asarray(rng.standard_normal((b, c)) * 0.1, jnp.float32)
    alpha = jnp.asarray(np.abs(rng.standard_normal(c)) + 0.5, jnp.float32)
    w = jnp.asarray(rng.standard_normal((c, c, k)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(c) * 0.01, jnp.float32)
    n_valid = jnp.asarray([t, t - 137], jnp.int32)

    got, st = VP.fused_ada_snake_conv(x, scale, shift, alpha, w, bias,
                                      dilation, n_valid, interpret=True,
                                      residual=res, out_stats=True)
    assert got is not None
    base = VP.fused_ada_snake_conv(x, scale, shift, alpha, w, bias,
                                   dilation, n_valid, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base + res),
                               atol=2e-5, rtol=1e-5)
    if tile_splits:
        assert st.shape[1] > 1, st.shape
    # stats vs masked host reduction of the actual output
    mask = (np.arange(t)[None, :] < np.asarray(n_valid)[:, None])[..., None]
    om = np.asarray(got) * mask
    tot = np.asarray(st).sum(axis=1)  # (B, 2, C)
    np.testing.assert_allclose(tot[:, 0], om.sum(axis=1), atol=1e-3,
                               rtol=1e-4)
    np.testing.assert_allclose(tot[:, 1], (om * om).sum(axis=1), atol=1e-2,
                               rtol=1e-4)


def test_affine_from_stats_matches_two_pass():
    """_affine_from_stats (one-pass, kernel partial sums) == the two-pass
    _adain_affine/_adain_affine_folded, unfolded and folded."""
    rng = np.random.default_rng(8)
    b, t, c, sd, f = 2, 240, 128, 16, 2
    key = jax.random.PRNGKey(3)
    p = L.adain_1d_init(key, sd, c // f)
    pf = L.adain_1d_init(key, sd, c)
    s = jnp.asarray(rng.standard_normal((b, sd)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    nv = jnp.asarray([t, t - 48], jnp.int32)

    # unfolded (f=1): stats blocks from a host-side tile split
    n_tiles = 4
    xs = np.asarray(x).reshape(b, n_tiles, t // n_tiles, c)
    mask_rows = (np.arange(t)[None, :] < np.asarray(nv)[:, None]).reshape(
        b, n_tiles, t // n_tiles, 1)
    stats = np.stack([(xs * mask_rows).sum(axis=2),
                      ((xs * mask_rows) ** 2).sum(axis=2)], axis=2)
    sc, sh = B._affine_from_stats(pf, jnp.asarray(stats, jnp.float32), s,
                                  nv, 1)
    mask2d = jnp.arange(t)[None, :] < nv[:, None]
    sc2, sh2 = B._adain_affine(pf, x, s, mask2d)
    np.testing.assert_allclose(np.asarray(sc), np.asarray(sc2), atol=2e-4,
                               rtol=2e-4)
    np.testing.assert_allclose(np.asarray(sh), np.asarray(sh2), atol=2e-4,
                               rtol=2e-4)

    # folded (f=2): a (B, T, C/f) tensor viewed as (B, T/f, C) with
    # phase-merged stats
    nv_f = nv // f
    x2 = jnp.asarray(rng.standard_normal((b, t, c // f)), jnp.float32)
    x_f = x2.reshape(b, t // f, c)
    mask_f = (np.arange(t // f)[None, :]
              < np.asarray(nv_f)[:, None]).reshape(b, 1, t // f, 1)
    xs_f = np.asarray(x_f).reshape(b, 1, t // f, c)
    stats_f = np.stack([(xs_f * mask_f).sum(axis=2),
                        ((xs_f * mask_f) ** 2).sum(axis=2)], axis=2)
    sc3, sh3 = B._affine_from_stats(p, jnp.asarray(stats_f, jnp.float32), s,
                                    nv_f, f)
    sc4, sh4 = B._adain_affine_folded(p, x_f, s, nv_f, f)
    np.testing.assert_allclose(np.asarray(sc3), np.asarray(sc4), atol=2e-4,
                               rtol=2e-4)
    np.testing.assert_allclose(np.asarray(sh3), np.asarray(sh4), atol=2e-4,
                               rtol=2e-4)


def test_stage_folded_generator_matches_unfolded(monkeypatch):
    """decoder.hifigan_generator_apply's stage-folded fast path (folded
    noise convs via fold_strided_conv1d_weight_np, x_folded resblocks,
    folded conv_post) == the unfolded path, f32, with a padded bucket."""
    from styletts2_tpu.config import DecoderConfig
    from styletts2_tpu.convert import fuse_weight_norm
    from styletts2_tpu.nn import decoder as DEC

    cfg = DecoderConfig(type="hifigan",
                        resblock_kernel_sizes=[3, 7],
                        upsample_rates=[2, 2, 2, 2],
                        upsample_initial_channel=128,
                        resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5]],
                        upsample_kernel_sizes=[4, 4, 4, 4])
    key = jax.random.PRNGKey(5)
    p_plain = fuse_weight_norm(
        DEC.hifigan_generator_init(key, cfg, style_dim=32))
    p_fold = DEC.prefold_generator_params(
        {"generator": jax.tree.map(lambda v: v, p_plain)}, cfg)["generator"]
    # every noise conv and conv_post got a prefolded weight
    for i in range(4):
        assert "wsfold" in p_fold["noise_convs"][str(i)], i
    assert "wfold" in p_fold["conv_post"]

    rng = np.random.default_rng(11)
    b, t = 2, 40
    x = jnp.asarray(rng.standard_normal((b, t, 128)), jnp.float32) * 0.3
    s = jnp.asarray(rng.standard_normal((b, 32)), jnp.float32)
    f0 = jnp.asarray(np.abs(rng.standard_normal((b, t))) * 100 + 80,
                     jnp.float32)
    lens = np.array([t, 28])
    mask = jnp.arange(t)[None, :] < jnp.asarray(lens)[:, None]

    monkeypatch.setenv("STYLETTS2_TPU_STAGE_FOLD", "0")
    want = DEC.hifigan_generator_apply(p_plain, x, s, f0, None, cfg,
                                       frame_mask=mask)
    monkeypatch.setenv("STYLETTS2_TPU_STAGE_FOLD", "1")
    got = DEC.hifigan_generator_apply(p_fold, x, s, f0, None, cfg,
                                      frame_mask=mask)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-3)
