"""Golden parameter-count tests vs the published SD1.5 checkpoints.

An exact match requires every layer's shape to be right — the strongest
structural-parity check available without the weights themselves (the interop
roundtrip tests then lock the name mapping).
"""

import jax
import jax.numpy as jnp

from synfmc_tpu.models.clip_text import CLIPTextModel
from synfmc_tpu.models.unet3d import UNet3D
from synfmc_tpu.models.vae import AutoencoderKL


def _count(shapes):
    return sum(int(jnp.prod(jnp.array(s.shape))) for s in jax.tree_util.tree_leaves(shapes))


def test_sd15_unet_param_count():
    unet = UNet3D()  # SD1.5 defaults: no motion modules, no LoRA
    shapes = jax.eval_shape(
        lambda r: unet.init(
            r, jnp.zeros((1, 1, 32, 48, 4)), jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 768))
        ),
        jax.random.PRNGKey(0),
    )
    assert _count(shapes) == 859_520_964  # runwayml/stable-diffusion-v1-5 unet


def test_sd15_vae_param_count():
    vae = AutoencoderKL()
    shapes = jax.eval_shape(
        lambda r: vae.init(r, jnp.zeros((1, 64, 64, 3))), jax.random.PRNGKey(0)
    )
    assert _count(shapes) == 83_653_863  # SD1.5 AutoencoderKL


def test_clip_text_param_count():
    text = CLIPTextModel()
    shapes = jax.eval_shape(
        lambda r: text.init(r, jnp.zeros((1, 77), jnp.int32)), jax.random.PRNGKey(0)
    )
    assert _count(shapes) == 123_060_480  # openai/clip-vit-large-patch14 text model
