"""Loss library parity vs the reference losses.py (under stubs)."""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import has_reference, add_reference_to_path

torch = pytest.importorskip("torch")

if not has_reference():  # pragma: no cover
    pytest.skip("reference not mounted", allow_module_level=True)

import ref_stubs

ref_stubs.install()
add_reference_to_path()

from styletts2_tpu import losses as LO
from styletts2_tpu.convert import module_to_tree
from styletts2_tpu.nn import discriminators as DISC


def test_mrstft_loss_parity():
    import losses as ref_losses  # reference losses.py under stubs

    torch.manual_seed(0)
    x = torch.randn(2, 9600) * 0.2
    y = torch.randn(2, 9600) * 0.2
    mod = ref_losses.MultiResolutionSTFTLoss()
    with torch.no_grad():
        ref = mod(x, y).item()
    ours = float(LO.multi_resolution_stft_loss(jnp.asarray(x.numpy()),
                                               jnp.asarray(y.numpy())))
    assert ours == pytest.approx(ref, rel=2e-3)


def test_lsgan_and_tprls_parity():
    import losses as ref_losses

    torch.manual_seed(1)
    outs_r = [torch.randn(2, 40), torch.randn(2, 33)]
    outs_g = [torch.randn(2, 40), torch.randn(2, 33)]
    ref_d, _, _ = ref_losses.discriminator_loss(outs_r, outs_g)
    ref_g, _ = ref_losses.generator_loss(outs_g)
    ref_tprls_d = ref_losses.discriminator_TPRLS_loss(outs_r, outs_g)
    ref_tprls_g = ref_losses.generator_TPRLS_loss(outs_r, outs_g)

    j_r = [jnp.asarray(t.numpy()) for t in outs_r]
    j_g = [jnp.asarray(t.numpy()) for t in outs_g]
    assert float(LO.discriminator_adv_loss(j_r, j_g)) == pytest.approx(
        ref_d.item(), rel=1e-4)
    assert float(LO.generator_adv_loss(j_g)) == pytest.approx(
        ref_g.item(), rel=1e-4)
    assert float(LO.discriminator_tprls_loss(j_r, j_g)) == pytest.approx(
        ref_tprls_d.item(), rel=1e-3, abs=1e-6)
    # reference generator_TPRLS_loss zips (real, fake) into (dg, dr) —
    # the SWAPPED binding, NOT the same expression (losses.py:140-147)
    assert float(LO.generator_tprls_loss(j_r, j_g)) == pytest.approx(
        ref_tprls_g.item(), rel=1e-3, abs=1e-6)


def test_tprls_parity_small_magnitudes():
    """Unit-variance inputs put L_rel >> tau=0.04 so both TPRLS variants
    saturate at tau and a binding bug is invisible. Sub-tau magnitudes keep
    the relu clamp inactive — exactly the regime where gradient flows — and
    there the generator/discriminator variants must DIFFER (the reference's
    swapped zip selects the opposite tail around the median)."""
    import losses as ref_losses

    torch.manual_seed(7)
    outs_r = [torch.randn(2, 40) * 0.05, torch.randn(2, 33) * 0.05]
    outs_g = [torch.randn(2, 40) * 0.05, torch.randn(2, 33) * 0.05]
    ref_d = ref_losses.discriminator_TPRLS_loss(outs_r, outs_g).item()
    ref_g = ref_losses.generator_TPRLS_loss(outs_r, outs_g).item()
    assert ref_d != pytest.approx(ref_g, rel=1e-3)  # the regime is active

    j_r = [jnp.asarray(t.numpy()) for t in outs_r]
    j_g = [jnp.asarray(t.numpy()) for t in outs_g]
    assert float(LO.discriminator_tprls_loss(j_r, j_g)) == pytest.approx(
        ref_d, rel=1e-4, abs=1e-8)
    assert float(LO.generator_tprls_loss(j_r, j_g)) == pytest.approx(
        ref_g, rel=1e-4, abs=1e-8)


def test_feature_loss_parity():
    import losses as ref_losses

    torch.manual_seed(2)
    fr = [[torch.randn(2, 3, 10), torch.randn(2, 4, 8)],
          [torch.randn(2, 5, 6)]]
    fg = [[torch.randn(2, 3, 10), torch.randn(2, 4, 8)],
          [torch.randn(2, 5, 6)]]
    ref = ref_losses.feature_loss(fr, fg).item()
    ours = float(LO.feature_loss(
        [[jnp.asarray(t.numpy()) for t in d] for d in fr],
        [[jnp.asarray(t.numpy()) for t in d] for d in fg]))
    assert ours == pytest.approx(ref, rel=1e-4)


def test_full_generator_discriminator_loss_parity():
    """End-to-end GeneratorLoss/DiscriminatorLoss wrappers with real
    MPD/MSD modules and converted weights."""
    import losses as ref_losses
    from Modules.discriminators import (MultiPeriodDiscriminator,
                                        MultiResSpecDiscriminator)

    torch.manual_seed(3)
    mpd = MultiPeriodDiscriminator().eval()
    msd = MultiResSpecDiscriminator().eval()
    gl = ref_losses.GeneratorLoss(mpd, msd)
    dl = ref_losses.DiscriminatorLoss(mpd, msd)

    orig_get_device = torch.Tensor.get_device
    torch.Tensor.get_device = lambda self: "cpu"
    try:
        y = torch.randn(1, 1, 9000) * 0.3
        y_hat = torch.randn(1, 1, 9000) * 0.3
        with torch.no_grad():
            ref_g = gl(y, y_hat).item()
            ref_d = dl(y, y_hat).item()
    finally:
        torch.Tensor.get_device = orig_get_device

    mpd_tree = module_to_tree(mpd)
    msd_tree = module_to_tree(msd)
    yj = jnp.asarray(y.transpose(1, 2).numpy())
    yhj = jnp.asarray(y_hat.transpose(1, 2).numpy())
    ours_g = float(LO.generator_loss(mpd_tree, msd_tree, yj, yhj))
    ours_d = float(LO.discriminator_loss(mpd_tree, msd_tree, yj, yhj))
    assert ours_g == pytest.approx(ref_g, rel=5e-3)
    assert ours_d == pytest.approx(ref_d, rel=5e-3)


def test_multi_optimizer_smoke():
    import jax
    from styletts2_tpu.optim import MultiOptimizer

    params = {"decoder": {"w": jnp.ones((4,))},
              "predictor": {"w": jnp.ones((4,))}}
    opt = MultiOptimizer(params, lr=1e-4, ft_lr=1e-5)
    states = opt.init(params)
    grads = {"decoder": {"w": jnp.ones((4,))},
             "predictor": {"w": jnp.ones((4,))}}
    new_params, new_states = opt.step_modules(["decoder"], grads, states, params)
    assert float(jnp.abs(new_params["decoder"]["w"] - 1.0).max()) > 0
    assert float(jnp.abs(new_params["predictor"]["w"] - 1.0).max()) == 0
    # acoustic module lr override
    assert opt.lrs["decoder"] == 1e-5 and opt.lrs["predictor"] == 1e-4
