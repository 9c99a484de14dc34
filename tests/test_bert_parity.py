"""JAX BERT stack parity vs torch/transformers (CPU, identical weights).

The reference checkpoints ship as LFS stubs, so parity is proven
architecturally: a random-initialized HF BertModel's weights are converted
into our stacked pytree and outputs must match to float32 tolerance. This
validates that real checkpoints load correctly when present
(SURVEY.md §7.2 step 1).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from financial_rag_tpu.config import ModelConfig
from financial_rag_tpu.models import (
    bert_encode,
    bert_forward,
    cross_encoder_forward,
    params_from_torch_state_dict,
    random_params,
)

SMALL = dict(
    vocab_size=500,
    hidden_size=128,
    num_hidden_layers=3,
    num_attention_heads=4,
    intermediate_size=256,
    max_position_embeddings=96,
    type_vocab_size=2,
    hidden_dropout_prob=0.0,
    attention_probs_dropout_prob=0.0,
    hidden_act="gelu",
    layer_norm_eps=1e-12,
)


def _model_config(num_labels=0):
    return ModelConfig(
        name="tiny",
        hidden_size=SMALL["hidden_size"],
        num_layers=SMALL["num_hidden_layers"],
        num_heads=SMALL["num_attention_heads"],
        intermediate_size=SMALL["intermediate_size"],
        vocab_size=SMALL["vocab_size"],
        max_position=SMALL["max_position_embeddings"],
        type_vocab_size=2,
        layer_norm_eps=1e-12,
        num_labels=num_labels,
    )


def _batch(rng, b=3, s=40, vocab=500):
    ids = rng.integers(5, vocab, size=(b, s)).astype(np.int32)
    mask = np.ones((b, s), np.int32)
    mask[0, 25:] = 0
    mask[1, 10:] = 0
    ids[mask == 0] = 0
    tt = np.zeros((b, s), np.int32)
    tt[2, 20:] = 1
    return ids, mask, tt


@pytest.fixture(scope="module")
def torch_bert():
    torch.manual_seed(0)
    cfg = transformers.BertConfig(**SMALL)
    model = transformers.BertModel(cfg)
    model.eval()
    return model


def test_forward_parity(torch_bert, rng):
    ids, mask, tt = _batch(rng)
    cfg = _model_config()
    params = params_from_torch_state_dict(torch_bert.state_dict(), cfg)

    with torch.no_grad():
        ref = torch_bert(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
            token_type_ids=torch.tensor(tt.astype(np.int64)),
        ).last_hidden_state.numpy()

    ours = np.asarray(bert_forward(params, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(tt), config=cfg))

    # compare only non-padded positions (padded positions are junk in both)
    m = mask.astype(bool)
    diff = np.abs(ours[m] - ref[m])
    assert diff.max() < 2e-4, f"max diff {diff.max()}"


@pytest.mark.parametrize("pooling", ["cls", "mean"])
def test_encode_unit_norm_and_parity(torch_bert, rng, pooling):
    ids, mask, tt = _batch(rng)
    cfg = _model_config()
    params = params_from_torch_state_dict(torch_bert.state_dict(), cfg)
    emb = np.asarray(bert_encode(params, jnp.asarray(ids), jnp.asarray(mask), config=cfg, pooling=pooling))
    assert emb.shape == (3, SMALL["hidden_size"])
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-5)

    with torch.no_grad():
        hs = torch_bert(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        ).last_hidden_state.numpy()
    if pooling == "cls":
        ref = hs[:, 0]
    else:
        m = mask[:, :, None].astype(np.float32)
        ref = (hs * m).sum(1) / m.sum(1)
    ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
    cos = (emb * ref).sum(-1)
    assert cos.min() > 0.99999, f"cosine {cos}"


def test_cross_encoder_parity(rng):
    torch.manual_seed(1)
    cfg_t = transformers.BertConfig(**SMALL, num_labels=1)
    model = transformers.BertForSequenceClassification(cfg_t)
    model.eval()
    cfg = _model_config(num_labels=1)
    params = params_from_torch_state_dict(model.state_dict(), cfg)

    ids, mask, tt = _batch(rng)
    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64)),
            token_type_ids=torch.tensor(tt.astype(np.int64)),
        ).logits.numpy()[:, 0]
    ours = np.asarray(cross_encoder_forward(params, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(tt), config=cfg))
    np.testing.assert_allclose(ours, ref, atol=2e-4)


@pytest.mark.smoke
def test_random_params_deterministic():
    cfg = _model_config(num_labels=1)
    a = random_params(cfg, seed=7)
    b = random_params(cfg, seed=7)
    c = random_params(cfg, seed=8)
    np.testing.assert_array_equal(np.asarray(a["layers"]["q_w"]), np.asarray(b["layers"]["q_w"]))
    assert not np.array_equal(np.asarray(a["layers"]["q_w"]), np.asarray(c["layers"]["q_w"]))
    assert "classifier" in a


@pytest.mark.smoke
def test_npz_roundtrip(tmp_path):
    from financial_rag_tpu.models.checkpoint import load_params_npz, save_params_npz

    cfg = _model_config()
    p = random_params(cfg, seed=3)
    f = tmp_path / "p.npz"
    save_params_npz(p, f)
    q = load_params_npz(f)
    np.testing.assert_array_equal(np.asarray(p["layers"]["ffn_in_w"]), np.asarray(q["layers"]["ffn_in_w"]))
    np.testing.assert_array_equal(np.asarray(p["embeddings"]["word"]), np.asarray(q["embeddings"]["word"]))


def test_bf16_compute_close():
    cfg = _model_config()
    params = random_params(cfg, seed=0)
    rng = np.random.default_rng(1)
    ids, mask, _ = _batch(rng)
    f32 = np.asarray(bert_encode(params, jnp.asarray(ids), jnp.asarray(mask), config=cfg, pooling="mean"))
    bf16 = np.asarray(
        bert_encode(params, jnp.asarray(ids), jnp.asarray(mask), config=cfg, pooling="mean",
                    compute_dtype=jnp.bfloat16))
    cos = (f32 * bf16).sum(-1)
    assert cos.min() > 0.995
