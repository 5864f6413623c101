"""One forward pass at the REAL BLIP geometry (VERDICT r4 ask #5).

The shipped config (reference models/blip-config.json: ViT-L/16, 24
layers, hidden 1024, image 384, + 12-layer text tower) had only ever
been shape-checked; this executes it — so "HF weights would load and
go" rests on an actually-run program, not an import test.  Random-init
params (quality is gated separately by tests/test_blip_quality.py's
trained mini-ITC); marked slow — one ViT-L forward on the CPU test host.
"""

import time

import numpy as np
import pytest

from pixelbox_tpu.models.blip import BlipConfig, BlipSearcher

from fixtures import textured_image

pytestmark = pytest.mark.slow

_CONFIG_JSON = "/root/reference/models/blip-config.json"


def test_full_geometry_one_forward():
    import jax

    cfg = BlipConfig.from_json(_CONFIG_JSON)
    assert (cfg.vision.hidden_size, cfg.vision.num_layers,
            cfg.vision.image_size) == (1024, 24, 384)

    t0 = time.perf_counter()
    searcher = BlipSearcher(cfg=cfg, max_text_len=16)
    init_s = time.perf_counter() - t0

    n_params = sum(
        int(np.prod(x.shape)) for x in jax.tree.leaves(searcher.variables)
    )
    # ViT-L (~303M) + BERT-base text tower (~110M) + projections.
    assert 3.5e8 < n_params < 6e8, n_params

    t0 = time.perf_counter()
    img_h = searcher.image_hashes(
        [textured_image(seed=1, size=(400, 300))]
    )
    img_s = time.perf_counter() - t0
    assert img_h.shape == (1, cfg.projection_dim)
    assert img_h.dtype == np.uint8

    t0 = time.perf_counter()
    txt_h = searcher.text_hashes(["a photo of a cat on a beach"])
    txt_s = time.perf_counter() - t0
    assert txt_h.shape == (1, cfg.projection_dim)

    # Real computation, not a constant collapse: u8 codes must spread
    # (an all-128 hash would mean a zero/NaN latent got quantized).
    assert len(np.unique(img_h)) > 8, img_h[:, :16]
    assert len(np.unique(txt_h)) > 8, txt_h[:, :16]
    # Determinism at this geometry (same program, same result).
    np.testing.assert_array_equal(
        txt_h, searcher.text_hashes(["a photo of a cat on a beach"])
    )
    print(f"full-geometry BLIP: params={n_params/1e6:.0f}M "
          f"init={init_s:.1f}s image_fwd={img_s:.1f}s text_fwd={txt_s:.1f}s")


def test_full_geometry_hf_roundtrip():
    """HF state-dict import roundtrip at the REAL geometry (VERDICT r4
    #5: 'keep the HF import round-trip at that geometry'): export a
    ViT-L/16-sized init into the HF layout, re-import, require bit-exact
    tree equality — so real BLIP weights are load-and-go by the same
    code path the tiny-geometry test proves."""
    import jax
    import jax.numpy as jnp

    from pixelbox_tpu.models.blip import (
        BlipRetrievalModule,
        params_from_hf_state_dict,
    )

    from blip_hf_util import assert_tree_equal, hf_state_dict_from_params

    cfg = BlipConfig.from_json(_CONFIG_JSON)
    module = BlipRetrievalModule(cfg)
    s = cfg.vision.image_size
    variables = module.init(
        jax.random.PRNGKey(5),
        jnp.zeros((1, s, s, 3), jnp.float32),
        jnp.zeros((1, 8), jnp.int32),
        jnp.ones((1, 8), jnp.int32),
    )
    p = variables["params"]
    sd = hf_state_dict_from_params(p, cfg)
    assert len(sd) > 350  # ViT-L 24 layers + 12-layer text tower
    imported = params_from_hf_state_dict(sd, cfg)
    assert_tree_equal(p, imported["params"])
