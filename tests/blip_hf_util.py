"""Shared helper: export BlipRetrievalModule params into a synthetic
HuggingFace-layout state dict (the inverse of
models.blip.params_from_hf_state_dict), so roundtrip tests can run at
any geometry — tiny (tests/test_blip_quality.py) and the REAL shipped
ViT-L config (tests/test_blip_full_geometry.py)."""

import numpy as np


def hf_state_dict_from_params(p, cfg):
    sd = {}

    def dense_inv(dst, node):
        sd[f"{dst}.weight"] = np.transpose(np.asarray(node["kernel"]))
        sd[f"{dst}.bias"] = np.asarray(node["bias"])

    def ln_inv(dst, node):
        sd[f"{dst}.weight"] = np.asarray(node["scale"])
        sd[f"{dst}.bias"] = np.asarray(node["bias"])

    v = p["vision"]
    sd["vision_model.embeddings.patch_embedding.weight"] = np.transpose(
        np.asarray(v["patch_embed"]["kernel"]), (3, 2, 0, 1)
    )
    sd["vision_model.embeddings.patch_embedding.bias"] = np.asarray(
        v["patch_embed"]["bias"]
    )
    sd["vision_model.embeddings.class_embedding"] = np.asarray(
        v["cls_token"]
    ).reshape(-1)
    sd["vision_model.embeddings.position_embedding"] = np.asarray(
        v["pos_embed"]
    )
    for i in range(cfg.vision.num_layers):
        lyr = v[f"layer{i}"]
        src = f"vision_model.encoder.layers.{i}"
        qkv_w = np.concatenate(
            [np.transpose(np.asarray(lyr["attn"][nm]["kernel"]))
             for nm in ("q", "k", "v")], axis=0
        )
        qkv_b = np.concatenate(
            [np.asarray(lyr["attn"][nm]["bias"]) for nm in ("q", "k", "v")]
        )
        sd[f"{src}.self_attn.qkv.weight"] = qkv_w
        sd[f"{src}.self_attn.qkv.bias"] = qkv_b
        dense_inv(f"{src}.self_attn.projection", lyr["attn"]["out"])
        ln_inv(f"{src}.layer_norm1", lyr["ln1"])
        ln_inv(f"{src}.layer_norm2", lyr["ln2"])
        dense_inv(f"{src}.mlp.fc1", lyr["mlp_in"])
        dense_inv(f"{src}.mlp.fc2", lyr["mlp_out"])
    ln_inv("vision_model.post_layernorm", v["post_ln"])

    t = p["text"]
    sd["text_encoder.embeddings.word_embeddings.weight"] = np.asarray(
        t["tok_embed"]["embedding"]
    )
    sd["text_encoder.embeddings.position_embeddings.weight"] = np.asarray(
        t["pos_embed"]["embedding"]
    )
    ln_inv("text_encoder.embeddings.LayerNorm", t["embed_ln"])
    for i in range(cfg.text.num_layers):
        lyr = t[f"layer{i}"]
        src = f"text_encoder.encoder.layer.{i}"
        dense_inv(f"{src}.attention.self.query", lyr["attn"]["q"])
        dense_inv(f"{src}.attention.self.key", lyr["attn"]["k"])
        dense_inv(f"{src}.attention.self.value", lyr["attn"]["v"])
        dense_inv(f"{src}.attention.output.dense", lyr["attn"]["out"])
        ln_inv(f"{src}.attention.output.LayerNorm", lyr["ln1"])
        dense_inv(f"{src}.intermediate.dense", lyr["mlp_in"])
        dense_inv(f"{src}.output.dense", lyr["mlp_out"])
        ln_inv(f"{src}.output.LayerNorm", lyr["ln2"])

    dense_inv("vision_proj", p["vision_proj"])
    dense_inv("text_proj", p["text_proj"])
    return sd


def assert_tree_equal(p, imported_params):
    import jax

    flat_orig = jax.tree_util.tree_flatten_with_path(p)[0]
    flat_imp = jax.tree_util.tree_flatten_with_path(imported_params)[0]
    orig_keys = {jax.tree_util.keystr(k) for k, _ in flat_orig}
    imp_keys = {jax.tree_util.keystr(k) for k, _ in flat_imp}
    assert orig_keys == imp_keys, (
        f"missing={sorted(orig_keys - imp_keys)} "
        f"extra={sorted(imp_keys - orig_keys)}"
    )
    imp_by_key = {jax.tree_util.keystr(k): np.asarray(x) for k, x in flat_imp}
    for k, x in flat_orig:
        np.testing.assert_array_equal(
            np.asarray(x), imp_by_key[jax.tree_util.keystr(k)],
            err_msg=f"value drift at {jax.tree_util.keystr(k)}",
        )
