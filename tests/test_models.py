"""Model forward/generation shape + semantics tests for all 3 architectures
x 3 priors."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exemplar_vae_tpu.config import Config, parse_conv_spec
from exemplar_vae_tpu.models import create_model

MODELS = ["vae", "hvae_2level", "convhvae_2level", "pixelhvae_2level"]
PRIORS = ["standard", "vampprior", "exemplar_prior"]


def _mk(model_name, prior, **kw):
    cfg = Config(model_name=model_name, prior=prior, number_components=8,
                 hidden_size=32, z1_size=10, z2_size=12, **kw)
    m = create_model(cfg)
    x = jnp.linspace(0, 1, 4 * 28 * 28).reshape(4, 28, 28, 1)
    k = jax.random.PRNGKey(0)
    return cfg, m, x, m.init(k, x, k)


@pytest.mark.parametrize("model_name", MODELS)
@pytest.mark.parametrize("prior", PRIORS)
def test_forward_shapes(model_name, prior):
    cfg, m, x, v = _mk(model_name, prior)
    out = m.apply(v, x, jax.random.PRNGKey(1))
    top = cfg.z1_size if model_name == "vae" else cfg.z2_size
    assert out.z_top.shape == (4, top)
    assert out.x_mean.shape == (4, 28, 28, 1)
    assert out.extra_kl.shape == (4,)
    if model_name == "vae":
        assert np.allclose(np.asarray(out.extra_kl), 0.0)
    probs = np.asarray(out.x_mean)
    assert (probs >= 0).all() and (probs <= 1).all()


def test_pixelcnn_decoder_is_causal():
    """The defining PixelCNN property: likelihood params at pixel i must
    not depend on pixels at or after i in raster order. Perturb a late
    pixel, assert every earlier pixel's output is unchanged (and the
    perturbed pixel's own output too — mask 'A' blocks the center)."""
    cfg, m, x, v = _mk("pixelhvae_2level", "standard")
    k = jax.random.PRNGKey(2)
    z1 = jax.random.normal(jax.random.fold_in(k, 1), (4, cfg.z1_size))
    z2 = jax.random.normal(jax.random.fold_in(k, 2), (4, cfg.z2_size))
    mean1, _ = m.apply(v, x, z1, z2, method="decode")
    r, c = 20, 13                      # perturb pixel (20, 13)
    x2 = x.at[:, r, c, 0].set(1.0 - x[:, r, c, 0])
    mean2, _ = m.apply(v, x2, z1, z2, method="decode")
    a = np.asarray(mean1).reshape(4, -1)
    b = np.asarray(mean2).reshape(4, -1)
    i = r * 28 + c
    np.testing.assert_array_equal(a[:, :i + 1], b[:, :i + 1])
    # and later pixels DO change (the x-conditioning is real)
    assert not np.allclose(a[:, i + 1:], b[:, i + 1:])


def test_pixelhvae_trains_end_to_end(tmp_path):
    """Full Experiment wiring for the PixelCNN decoder: exemplar prior on
    z2, teacher-forced training, validation, IWAE — all through the
    generic (non-fast) eval path."""
    from exemplar_vae_tpu.train.trainer import Experiment
    cfg = Config(dataset_name="synthetic", model_name="pixelhvae_2level",
                 prior="exemplar_prior", training_set_size=96,
                 val_set_size=32, test_set_size=16, number_components=96,
                 batch_size=32, warmup=2, epochs=2, S=2, MB=2,
                 test_batch_size=16, hidden_size=32, z1_size=8, z2_size=8,
                 # wiring test, not a capacity test: the default 64x4
                 # PixelCNN stack costs ~3 CPU-minutes of masked-conv FLOPs
                 # on this 1-core host for zero extra coverage
                 pixelcnn_features=16, pixelcnn_layers=2,
                 use_pallas_prior=False, prior_block_n=32,
                 exact_reencode_chunk=32, snapshot_dir=str(tmp_path))
    exp = Experiment(cfg, verbose=False)
    m1 = exp.train_epoch()
    m2 = exp.train_epoch()
    assert np.isfinite(m2["loss"])
    assert m2["loss"] < m1["loss"] + 5.0
    val = exp.validate()
    assert np.isfinite(val[0])
    eb = exp.build_eval_bank(exp.state.params, exp.bank,
                             jax.random.PRNGKey(0))
    nll, _ = exp.iwae(exp.state.params, exp.splits.test_x,
                      jax.random.PRNGKey(1), eb, s_total=2)
    assert np.isfinite(nll)


def test_pixelhvae_generation_is_autoregressive_sampling():
    cfg, m, x, v = _mk("pixelhvae_2level", "standard")
    z2 = jax.random.normal(jax.random.PRNGKey(3), (3, cfg.z2_size))
    gen = m.apply(v, z2, jax.random.PRNGKey(4), method="generate_from_top")
    assert gen.shape == (3, 28, 28, 1)
    assert set(np.unique(np.asarray(gen))) <= {0.0, 1.0}  # binary samples
    gen2 = m.apply(v, z2, jax.random.PRNGKey(4), method="generate_from_top")
    np.testing.assert_array_equal(np.asarray(gen), np.asarray(gen2))


@pytest.mark.parametrize("model_name", MODELS)
def test_encode_top_mean_matches_encode_top(model_name):
    cfg, m, x, v = _mk(model_name, "exemplar_prior")
    mean, _ = m.apply(v, x, method="encode_top")
    mean2 = m.apply(v, x, method="encode_top_mean")
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mean2))


def test_q_logvar_clamped():
    cfg, m, x, v = _mk("vae", "standard")
    _, lv = m.apply(v, x * 1000.0, method="encode_top")
    arr = np.asarray(lv)
    assert (arr >= -6.0).all() and (arr <= 2.0).all()


def test_continuous_decoder_has_logvar_head():
    cfg = Config(model_name="vae", prior="standard", input_type="gray",
                 hidden_size=32, dynamic_binarization=False)
    m = create_model(cfg)
    x = jnp.linspace(0, 1, 4 * 28 * 28).reshape(4, 28, 28, 1)
    k = jax.random.PRNGKey(0)
    v = m.init(k, x, k)
    out = m.apply(v, x, k)
    lv = np.asarray(out.x_logvar)
    assert (lv >= -4.5).all() and (lv <= 0.0).all()
    mean = np.asarray(out.x_mean)
    assert (mean >= 1 / 512).all() and (mean <= 1 - 1 / 512).all()


def test_exemplar_prior_param_exists_and_vamp_pseudo_inputs():
    cfg, m, x, v = _mk("vae", "exemplar_prior")
    assert v["params"]["prior_log_var"].shape == ()
    cfg2, m2, x2, v2 = _mk("vae", "vampprior")
    assert v2["params"]["pseudo_inputs"].shape == (8, 28, 28, 1)
    u = m2.apply(v2, method="get_pseudo_inputs")
    arr = np.asarray(u)
    assert (arr >= 0).all() and (arr <= 1).all()


def test_vamp_prior_log_prob_is_mixture():
    cfg, m, x, v = _mk("vae", "vampprior")
    z = jax.random.normal(jax.random.PRNGKey(3), (5, cfg.z1_size))
    lp = m.apply(v, z, method="log_p_z_top")
    # manual mixture
    u = m.apply(v, method="get_pseudo_inputs")
    mean, lv = m.apply(v, u, method="encode_top")
    comp = -0.5 * (np.asarray(lv)[None] + (np.asarray(z)[:, None]
                   - np.asarray(mean)[None]) ** 2 / np.exp(np.asarray(lv))[None])
    want = (jax.scipy.special.logsumexp(jnp.asarray(comp.sum(-1)), axis=-1)
            - jnp.log(8.0))
    np.testing.assert_allclose(np.asarray(lp), np.asarray(want), rtol=1e-5)


def test_generate_from_top_deterministic_given_key():
    cfg, m, x, v = _mk("hvae_2level", "standard")
    z = jax.random.normal(jax.random.PRNGKey(4), (3, cfg.z2_size))
    a = m.apply(v, z, jax.random.PRNGKey(5), method="generate_from_top")
    b = m.apply(v, z, jax.random.PRNGKey(5), method="generate_from_top")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bfloat16_compute_close_to_fp32():
    """bf16 matmul path: same params, outputs within bf16 tolerance of fp32
    (loss math / distribution params stay fp32 by contract)."""
    import jax.numpy as jnp
    cfg32 = Config(model_name="vae", prior="exemplar_prior", hidden_size=32,
                   z1_size=8)
    cfg16 = cfg32.replace(compute_dtype="bfloat16")
    m32, m16 = create_model(cfg32), create_model(cfg16)
    k = jax.random.PRNGKey(0)
    x = jnp.linspace(0, 1, 4 * 28 * 28).reshape(4, 28, 28, 1)
    v = m32.init(k, x, k)  # same param pytree shape for both
    o32 = m32.apply(v, x, k)
    o16 = m16.apply(v, x, k)
    assert o16.q_mean.dtype == jnp.float32  # heads cast back to fp32
    assert o16.x_mean.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(o16.q_mean), np.asarray(o32.q_mean),
                               atol=0.15)
    np.testing.assert_allclose(np.asarray(o16.x_mean), np.asarray(o32.x_mean),
                               atol=0.05)


def test_conv_spec_default_matches_legacy_architecture():
    """The externalized conv spec (Config.conv_enc_spec/conv_dec_spec) with
    default values reproduces the round-2 hard-coded stack exactly: same
    param tree, same shapes, same forward output."""
    cfg, m, x, v = _mk("convhvae_2level", "exemplar_prior")
    leaves = jax.tree_util.tree_leaves_with_path(v)
    n_params = sum(int(np.prod(l.shape)) for _, l in leaves)
    # pinned from the hard-coded round-2 architecture at these test sizes
    assert parse_conv_spec(cfg.conv_enc_spec) == (
        ("c", 32, 7, 1), ("c", 32, 3, 2), ("c", 64, 5, 1), ("c", 64, 3, 2))
    assert parse_conv_spec(cfg.conv_dec_spec) == (
        ("t", 64, 3, 2), ("t", 32, 3, 2), ("c", 32, 3, 1))
    out = m.apply(v, x, jax.random.PRNGKey(1))
    assert out.x_mean.shape == (4, 28, 28, 1)
    assert n_params > 0


def test_conv_spec_custom_stack_builds_and_runs():
    """A non-default spec (different depths/channels/strides, x4 via two s2
    encoder layers) builds, runs forward, and the decoder inverts the
    encoder's downsampling."""
    cfg, m, x, v = _mk(
        "convhvae_2level", "exemplar_prior",
        conv_enc_spec="8k3s2,16k3s2", conv_dec_spec="t16k3s2,t8k3s2",
        conv_proj_channels=16)
    out = m.apply(v, x, jax.random.PRNGKey(1))
    assert out.x_mean.shape == (4, 28, 28, 1)


def test_conv_spec_mismatched_strides_fails_loudly():
    import pytest as _pytest
    with _pytest.raises(AssertionError, match="downsampling"):
        _mk("convhvae_2level", "standard",
            conv_enc_spec="8k3s2,16k3s2", conv_dec_spec="t16k3s2")


def test_parse_conv_spec_rejects_garbage():
    import pytest as _pytest
    with _pytest.raises(ValueError, match="bad conv-spec"):
        parse_conv_spec("32x7s1")


def test_conv_spec_mixed_kinds_counted_signed():
    """A strided plain-conv layer inside a decoder DOWNSAMPLES; the
    stride bookkeeping must count it against the transpose layers so the
    mismatch fails at setup, not as a shape error deep in the loss."""
    import pytest as _pytest
    # t-up x4 but the middle stride-2 'c' halves it back: net x2 != enc x2?
    # enc: x2 down; dec: t2 * c/2 * t2 = net x2 -> OK case
    cfg, m, x, v = _mk(
        "convhvae_2level", "standard",
        conv_enc_spec="8k3s2", conv_dec_spec="t8k3s2,8k3s2,t8k3s2",
        conv_proj_channels=8)
    out = m.apply(v, x, jax.random.PRNGKey(1))
    assert out.x_mean.shape == (4, 28, 28, 1)
    # net dec scale x1 (t2 then c/2) vs enc x2 down -> must fail loudly
    with _pytest.raises(AssertionError, match="net upsampling"):
        _mk("convhvae_2level", "standard",
            conv_enc_spec="8k3s2", conv_dec_spec="t8k3s2,8k3s2")


@pytest.mark.parametrize("input_type", ["binary", "gray"])
def test_pixelhvae_cropped_sampler_matches_naive(input_type):
    """generate_from_top decodes a receptive-field crop per pixel; it must
    produce the SAME samples as the full-canvas-per-pixel oracle
    (generate_from_top_naive), including at image edges where the crop's
    validity masking has to reproduce SAME-padding zeros."""
    cfg = Config(model_name="pixelhvae_2level", prior="standard",
                 hidden_size=32, z1_size=6, z2_size=8,
                 input_size=(1, 10, 10), input_type=input_type,
                 pixelcnn_features=16, pixelcnn_layers=2)
    m = create_model(cfg)
    x = jnp.linspace(0, 1, 3 * 10 * 10).reshape(3, 10, 10, 1)
    k = jax.random.PRNGKey(0)
    v = m.init(k, x, k)
    z2 = jax.random.normal(jax.random.PRNGKey(7), (3, cfg.z2_size))
    fast = m.apply(v, z2, jax.random.PRNGKey(9), method="generate_from_top")
    ref = m.apply(v, z2, jax.random.PRNGKey(9),
                  method="generate_from_top_naive")
    if input_type == "binary":
        np.testing.assert_array_equal(np.asarray(fast), np.asarray(ref))
    else:
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                                   atol=1e-5)


def test_q_logvar_min_default_bit_identical_and_floor_binds():
    """cfg.q_logvar_min: -6.0 (default) must reproduce the reference
    hardtanh(-6,2) bit-for-bit; a raised floor must bind (the measured
    divergence mitigation, docs/DESIGN.md §4b)."""
    x = jnp.linspace(0, 1, 2 * 784).reshape(2, 28, 28, 1)
    k = jax.random.PRNGKey(0)
    for model in ["vae", "hvae_2level"]:
        base = dict(model_name=model, hidden_size=32, z1_size=6, z2_size=8)
        ma = create_model(Config(**base))
        mb = create_model(Config(**base, q_logvar_min=-6.0))
        oa = ma.apply(ma.init(k, x, k), x, k)
        ob = mb.apply(mb.init(k, x, k), x, k)
        np.testing.assert_array_equal(np.asarray(oa.q_logvar),
                                      np.asarray(ob.q_logvar))
        np.testing.assert_array_equal(np.asarray(oa.x_mean),
                                      np.asarray(ob.x_mean))
        mc = create_model(Config(**base, q_logvar_min=-4.0))
        oc = mc.apply(mc.init(k, x, k), x, k)
        assert float(np.asarray(oc.q_logvar).min()) >= -4.0
