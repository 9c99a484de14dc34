"""Checkpoint IO: HuggingFace safetensors -> stacked JAX param pytree.

The reference loads checkpoints through torch/sentence_transformers
(reference local_embedder.py:86-153). Here we convert HF `BertModel` /
`BertForSequenceClassification` weights directly into the functional pytree
consumed by financial_rag_tpu.models.bert (layers stacked on a leading axis
for lax.scan). Also provides deterministic random initialization so every
test and benchmark runs without real weights (the reference tree ships only
git-LFS pointer stubs for model.safetensors).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from financial_rag_tpu.config import ModelConfig
from financial_rag_tpu.utils import get_logger

log = get_logger("models.checkpoint")


def _is_lfs_stub(path: Path) -> bool:
    try:
        if path.stat().st_size > 1024:
            return False
        head = path.read_bytes()[:64]
        return head.startswith(b"version https://git-lfs")
    except OSError:
        return True


def random_params(config: ModelConfig, seed: int = 0, dtype=jnp.float32) -> Dict[str, Any]:
    """BERT-style truncated-normal(0.02) init, deterministic in `seed`."""
    rng = np.random.default_rng(seed)
    h, i_sz, nl = config.hidden_size, config.intermediate_size, config.num_layers

    def tn(*shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.02

    def zeros(*shape):
        return np.zeros(shape, np.float32)

    def ones(*shape):
        return np.ones(shape, np.float32)

    params: Dict[str, Any] = {
        "embeddings": {
            "word": tn(config.vocab_size, h),
            "position": tn(config.max_position, h),
            "token_type": tn(config.type_vocab_size, h),
            "ln_scale": ones(h),
            "ln_bias": zeros(h),
        },
        "layers": {
            "q_w": tn(nl, h, h), "q_b": zeros(nl, h),
            "k_w": tn(nl, h, h), "k_b": zeros(nl, h),
            "v_w": tn(nl, h, h), "v_b": zeros(nl, h),
            "o_w": tn(nl, h, h), "o_b": zeros(nl, h),
            "attn_ln_scale": ones(nl, h), "attn_ln_bias": zeros(nl, h),
            "ffn_in_w": tn(nl, h, i_sz), "ffn_in_b": zeros(nl, i_sz),
            "ffn_out_w": tn(nl, i_sz, h), "ffn_out_b": zeros(nl, h),
            "ffn_ln_scale": ones(nl, h), "ffn_ln_bias": zeros(nl, h),
        },
        "pooler": {"w": tn(h, h), "b": zeros(h)},
    }
    if config.num_labels:
        params["classifier"] = {"w": tn(h, config.num_labels), "b": zeros(config.num_labels)}
    return jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype), params)


def params_from_torch_state_dict(
    sd: Mapping[str, Any], config: ModelConfig, dtype=jnp.float32
) -> Dict[str, Any]:
    """Convert an HF BertModel / BertForSequenceClassification state dict
    (torch tensors or numpy arrays) into the stacked functional pytree."""

    def get(name: str) -> np.ndarray:
        for key in (name, f"bert.{name}"):
            if key in sd:
                t = sd[key]
                return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t, np.float32)
        raise KeyError(f"missing checkpoint tensor: {name}")

    nl = config.num_layers

    def stack_linear(fmt: str):
        """Stack per-layer torch Linear weights, transposed to (in, out)."""
        return np.stack([get(fmt.format(i)).T for i in range(nl)])

    def stack_vec(fmt: str):
        return np.stack([get(fmt.format(i)) for i in range(nl)])

    p = "encoder.layer.{}."
    params: Dict[str, Any] = {
        "embeddings": {
            "word": get("embeddings.word_embeddings.weight"),
            "position": get("embeddings.position_embeddings.weight"),
            "token_type": get("embeddings.token_type_embeddings.weight"),
            "ln_scale": get("embeddings.LayerNorm.weight"),
            "ln_bias": get("embeddings.LayerNorm.bias"),
        },
        "layers": {
            "q_w": stack_linear(p + "attention.self.query.weight"),
            "q_b": stack_vec(p + "attention.self.query.bias"),
            "k_w": stack_linear(p + "attention.self.key.weight"),
            "k_b": stack_vec(p + "attention.self.key.bias"),
            "v_w": stack_linear(p + "attention.self.value.weight"),
            "v_b": stack_vec(p + "attention.self.value.bias"),
            "o_w": stack_linear(p + "attention.output.dense.weight"),
            "o_b": stack_vec(p + "attention.output.dense.bias"),
            "attn_ln_scale": stack_vec(p + "attention.output.LayerNorm.weight"),
            "attn_ln_bias": stack_vec(p + "attention.output.LayerNorm.bias"),
            "ffn_in_w": stack_linear(p + "intermediate.dense.weight"),
            "ffn_in_b": stack_vec(p + "intermediate.dense.bias"),
            "ffn_out_w": stack_linear(p + "output.dense.weight"),
            "ffn_out_b": stack_vec(p + "output.dense.bias"),
            "ffn_ln_scale": stack_vec(p + "output.LayerNorm.weight"),
            "ffn_ln_bias": stack_vec(p + "output.LayerNorm.bias"),
        },
    }
    try:
        params["pooler"] = {"w": get("pooler.dense.weight").T, "b": get("pooler.dense.bias")}
    except KeyError:
        pass
    if "classifier.weight" in sd:
        w = np.asarray(
            sd["classifier.weight"].detach().cpu().numpy()
            if hasattr(sd["classifier.weight"], "detach") else sd["classifier.weight"], np.float32)
        b = np.asarray(
            sd["classifier.bias"].detach().cpu().numpy()
            if hasattr(sd["classifier.bias"], "detach") else sd["classifier.bias"], np.float32)
        params["classifier"] = {"w": w.T, "b": b}
    return jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype), params)


def load_params(
    model_dir: str | Path,
    config: Optional[ModelConfig] = None,
    *,
    dtype=jnp.float32,
    fallback_seed: Optional[int] = None,
):
    """Load params from a model directory containing model.safetensors.

    Returns (params, config). If the weights file is a git-LFS pointer stub
    (as in the reference snapshot) and fallback_seed is given, returns
    deterministic random params of the right architecture instead.
    """
    model_dir = Path(model_dir)
    if config is None:
        config = ModelConfig.from_json(model_dir)
    st_path = model_dir / "model.safetensors"

    if st_path.exists() and not _is_lfs_stub(st_path):
        from safetensors import safe_open

        sd: Dict[str, np.ndarray] = {}
        with safe_open(str(st_path), framework="numpy") as f:
            for key in f.keys():
                sd[key] = f.get_tensor(key)
        log.info("loaded %d tensors from %s", len(sd), st_path)
        return params_from_torch_state_dict(sd, config, dtype=dtype), config

    npz_path = model_dir / "model.npz"
    if npz_path.exists():
        # our own fine-tuned checkpoint format (training/rerank_ft.save_finetuned):
        # the params pytree flattened by save_params_npz, already this
        # framework's layout — no torch name mapping needed
        log.info("loaded fine-tuned params from %s", npz_path)
        return load_params_npz(npz_path, dtype=dtype), config

    if fallback_seed is not None:
        log.warning("weights at %s unavailable (LFS stub or missing); using seeded random init", st_path)
        return random_params(config, seed=fallback_seed, dtype=dtype), config
    raise FileNotFoundError(f"no usable weights at {st_path} (LFS stub or missing)")


def save_params_npz(params: Dict[str, Any], path: str | Path) -> None:
    """Flatten the pytree into an .npz archive (host persistence)."""
    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(str(getattr(k, "key", k)) for k in kp)
        flat[name] = np.asarray(leaf)
    np.savez(path, **flat)


def load_params_npz(path: str | Path, dtype=jnp.float32) -> Dict[str, Any]:
    data = np.load(path)
    params: Dict[str, Any] = {}
    for name in data.files:
        node = params
        parts = name.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(data[name], dtype)
    return params
