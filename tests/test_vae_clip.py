import jax
import jax.numpy as jnp
import numpy as np

from synfmc_tpu.data.tokenizer import BOS_ID, EOS_ID, HashTokenizer
from synfmc_tpu.models.clip_text import CLIPTextModel
from synfmc_tpu.models.vae import AutoencoderKL

TINY_VAE = dict(block_out_channels=(32, 64))


def test_vae_encode_decode_shapes(rng):
    vae = AutoencoderKL(**TINY_VAE)
    x = jnp.asarray(rng.normal(size=(2, 32, 48, 3)).astype(np.float32))
    v = vae.init(jax.random.PRNGKey(0), x, method=AutoencoderKL.encode)
    # 2 blocks -> one downsample -> /2
    z = vae.apply(v, x, method=AutoencoderKL.encode)
    assert z.shape == (2, 16, 24, 4)
    # decode needs decoder params too
    v_full = vae.init(jax.random.PRNGKey(0), x)
    y = vae.apply(v_full, z, method=AutoencoderKL.decode)
    assert y.shape == (2, 32, 48, 3)

    # stochastic encode differs from mode encode
    z_s = vae.apply(v_full, x, jax.random.PRNGKey(7), method=AutoencoderKL.encode)
    assert np.abs(np.asarray(z_s) - np.asarray(vae.apply(v_full, x, method=AutoencoderKL.encode))).max() > 0


def test_vae_scaling_factor_roundtrip(rng):
    """encode multiplies by 0.18215, decode divides (reference parity)."""
    vae = AutoencoderKL(**TINY_VAE)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    v = vae.init(jax.random.PRNGKey(0), x)
    mean, _ = vae.apply(v, x, method=AutoencoderKL.encode_moments)
    z = vae.apply(v, x, method=AutoencoderKL.encode)
    np.testing.assert_allclose(np.asarray(z), np.asarray(mean) * 0.18215, atol=1e-6)


def test_clip_text_model(rng):
    model = CLIPTextModel(vocab_size=1000, hidden_size=64, num_layers=2, num_heads=4)
    ids = jnp.asarray(rng.integers(0, 1000, size=(2, 77)).astype(np.int32))
    v = model.init(jax.random.PRNGKey(0), ids)
    out = model.apply(v, ids)
    assert out.shape == (2, 77, 64)

    # causal mask: changing a later token must not affect earlier positions
    ids2 = np.asarray(ids).copy()
    ids2[:, 50] = (ids2[:, 50] + 1) % 1000
    out2 = model.apply(v, jnp.asarray(ids2))
    np.testing.assert_allclose(np.asarray(out[:, :50]), np.asarray(out2[:, :50]), atol=1e-5)
    assert np.abs(np.asarray(out[:, 50:]) - np.asarray(out2[:, 50:])).max() > 1e-4


def test_clip_matches_real_transformers_library(rng):
    """Parity against the ACTUAL transformers.CLIPTextModel (the library the
    reference loads SD1.5's text encoder from, train_cam_ctrl.py:223) — not a
    transcription: random HF weights are ported through import_torch_state
    and last_hidden_state must match elementwise.  This pins quick_gelu, the
    causal mask, pre-LN placement, embedding arithmetic, the final LayerNorm,
    AND the weight-port name/layout mapping against the real implementation."""
    import torch
    from transformers import CLIPTextConfig
    from transformers import CLIPTextModel as HFCLIPTextModel

    from synfmc_tpu.interop.torch_port import import_torch_state

    cfg = CLIPTextConfig(
        vocab_size=1000, hidden_size=64, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=77, hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    hf = HFCLIPTextModel(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    ours = CLIPTextModel(vocab_size=1000, hidden_size=64, num_layers=2, num_heads=4)
    template = ours.init(jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32))["params"]
    params, report = import_torch_state(template, sd, "clip_text", strict=True)
    assert not report["missing"] and not report["unused"], report

    ids = rng.integers(0, 1000, size=(2, 77)).astype(np.int64)
    with torch.no_grad():
        want = hf(input_ids=torch.from_numpy(ids)).last_hidden_state.numpy()
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_hash_tokenizer_layout():
    tok = HashTokenizer()
    ids = tok(["a photo of a cat", ""])
    assert ids.shape == (2, 77)
    assert ids[0, 0] == BOS_ID and ids[1, 0] == BOS_ID
    assert ids[1, 1] == EOS_ID  # empty prompt: BOS EOS pad...
    assert (ids[0] == tok(["a photo of a cat"])[0]).all()  # deterministic
