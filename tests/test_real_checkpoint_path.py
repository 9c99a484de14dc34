"""The real-weights load path, end to end, on locally-constructed
safetensors checkpoints.

The reference snapshot ships git-LFS pointer stubs for every
model.safetensors and this environment has no network (RECALL.md), so the
north-star recall@10-with-real-weights number cannot be measured here. This
file instead proves every inch of the path real weights would take:

  HF-format model dir on disk (config.json + model.safetensors + vocab.txt)
  -> checkpoint.load_params (safetensors parse + layer stacking)
  -> Runtime.build via EMBED_*_PATH / CROSS_ENCODER_PATH env (NOT the
     HashingEncoder fallback)
  -> forward parity vs torch on the same directory
  -> ingest + query end-to-end through the loaded encoders.

With genuine bge/gte checkpoints dropped into local_models/, the identical
code path runs — only the tensor values change.
"""

import json
import shutil
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
safetensors_torch = pytest.importorskip("safetensors.torch")

VOCAB_SRC = Path("/root/reference/local_models/BAAI-bge-small-en-v1.5/vocab.txt")

# small layer count for test speed; hidden/vocab are the real bge-small
# values so the real vocab.txt and WordPiece path are exercised verbatim
ARCH = dict(
    vocab_size=30522, hidden_size=384, num_hidden_layers=3,
    num_attention_heads=12, intermediate_size=1536,
    max_position_embeddings=512, type_vocab_size=2,
    hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    hidden_act="gelu", layer_norm_eps=1e-12,
)


def _write_model_dir(dest: Path, seed: int, num_labels: int = 0) -> "torch.nn.Module":
    """Create an HF-format checkpoint directory exactly like a downloaded
    bge/gte/MiniLM snapshot (config.json, model.safetensors, vocab.txt)."""
    dest.mkdir(parents=True, exist_ok=True)
    torch.manual_seed(seed)
    cfg = transformers.BertConfig(**ARCH, num_labels=max(num_labels, 1))
    if num_labels:
        model = transformers.BertForSequenceClassification(cfg)
        sd = {k: v for k, v in model.state_dict().items()}
    else:
        model = transformers.BertModel(cfg)
        sd = model.state_dict()
    model.eval()
    safetensors_torch.save_file(
        {k: v.contiguous() for k, v in sd.items()}, str(dest / "model.safetensors"))
    raw = json.loads(cfg.to_json_string())
    (dest / "config.json").write_text(json.dumps(raw))
    shutil.copy(VOCAB_SRC, dest / "vocab.txt")
    return model


@pytest.fixture(scope="module")
def model_dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("checkpoints")
    baai = _write_model_dir(base / "baai", seed=0)
    gte = _write_model_dir(base / "gte", seed=1)
    ce = _write_model_dir(base / "cross", seed=2, num_labels=1)
    return base, {"baai": baai, "gte": gte, "ce": ce}


class TestOnDiskCheckpointPath:
    def test_load_params_reads_safetensors(self, model_dirs):
        from financial_rag_tpu.models.checkpoint import load_params

        base, _ = model_dirs
        params, cfg = load_params(base / "baai")
        assert cfg.num_layers == ARCH["num_hidden_layers"]
        assert params["layers"]["q_w"].shape[0] == cfg.num_layers
        ce_params, ce_cfg = load_params(base / "cross")
        assert "classifier" in ce_params

    def test_forward_parity_vs_torch_from_disk(self, model_dirs):
        """Encoder.from_pretrained(disk dir).encode == torch forward with the
        same tokenization, cosine > 0.9999 — the converter check VERDICT r1
        item 2 asks for when no real weights are obtainable."""
        from financial_rag_tpu.models.encoder import Encoder

        base, models = model_dirs
        enc = Encoder.from_pretrained(str(base / "baai"), pooling="mean")
        texts = ["What is the rent for the second year?",
                 "GST at eighteen percent applies to the invoice total."]
        ours = enc.encode(texts)

        tok = enc.tokenizer
        for i, t in enumerate(texts):
            ids = tok.encode(t, max_len=512)
            with torch.no_grad():
                hidden = models["baai"](
                    input_ids=torch.tensor([ids]),
                    attention_mask=torch.ones(1, len(ids), dtype=torch.long),
                ).last_hidden_state[0].numpy()
            ref = hidden.mean(axis=0)
            ref = ref / np.linalg.norm(ref)
            cos = float(ours[i] @ ref)
            assert cos > 0.9999, cos

    def test_cross_encoder_parity_vs_torch_from_disk(self, model_dirs):
        from financial_rag_tpu.retrieval.rerank import CrossEncoderModel

        base, models = model_dirs
        ce = CrossEncoderModel.from_pretrained(str(base / "cross"))
        pairs = [("what is the rent", "The annual rent is Rs 42,800."),
                 ("what is the rent", "Paris weather is mild in spring.")]
        ours = ce.predict(pairs)

        tok = ce.tokenizer
        for i, (a, b) in enumerate(pairs):
            ids, tts = tok.encode_pair(a, b, max_len=512)
            with torch.no_grad():
                logit = models["ce"](
                    input_ids=torch.tensor([ids]),
                    attention_mask=torch.ones(1, len(ids), dtype=torch.long),
                    token_type_ids=torch.tensor([tts]),
                ).logits[0, 0].item()
            assert abs(float(ours[i]) - logit) < 5e-3, (ours[i], logit)

    def test_runtime_builds_real_encoders_from_env(self, model_dirs, tmp_path,
                                                   monkeypatch,
                                                   reference_fixture_json):
        """Runtime.build with EMBED_*_PATH pointing at real (non-stub)
        checkpoints must load Encoder instances, a working reranker, and
        answer queries end-to-end — no lexical fallback anywhere."""
        from financial_rag_tpu.models.encoder import Encoder
        from financial_rag_tpu.runtime import Runtime

        base, _ = model_dirs
        monkeypatch.setenv("EMBED_BAAI_PATH", str(base / "baai"))
        monkeypatch.setenv("EMBED_GTE_PATH", str(base / "gte"))
        monkeypatch.setenv("CROSS_ENCODER_PATH", str(base / "cross"))
        rt = Runtime.build(data_dir=tmp_path)
        # microbatch-on (the default) wraps device-backed encoders in
        # BatchingEncoder — look through the wrapper for the fallback check
        assert all(isinstance(getattr(e, "inner", e), Encoder)
                   for e in rt.dual_encoder.encoders.values()), "fallback used"
        assert rt.engine.reranker.model is not None

        src = tmp_path / "cn.json"
        src.write_text(json.dumps(reference_fixture_json))
        rt.pipeline.ingest_extracted_json(src, "cn22-23")
        out = rt.engine.query("credit note number")
        assert out["success"] and out["top_children_chunks"]
        # rerank ran: the UI chunk carries the blended score (the engine's
        # field whitelist exposes final_rerank_score, engine.py _ui_children)
        assert out["top_children_chunks"][0]["final_rerank_score"] is not None

    def test_runtime_encode_dp_mesh_from_env(self, model_dirs, tmp_path,
                                             monkeypatch,
                                             reference_fixture_json):
        """ENCODE_DP=8 wires a data mesh into the real-checkpoint encoders;
        ingest + query run data-parallel on the 8-device test mesh."""
        from financial_rag_tpu.models.encoder import Encoder
        from financial_rag_tpu.runtime import Runtime

        base, _ = model_dirs
        monkeypatch.setenv("EMBED_BAAI_PATH", str(base / "baai"))
        monkeypatch.setenv("EMBED_GTE_PATH", str(base / "gte"))
        monkeypatch.setenv("ENCODE_DP", "8")
        rt = Runtime.build(data_dir=tmp_path)
        for e in rt.dual_encoder.encoders.values():
            e = getattr(e, "inner", e)   # through the microbatch wrapper
            assert isinstance(e, Encoder) and e.mesh is not None
            assert e.mesh.shape["data"] == 8

        src = tmp_path / "cn.json"
        src.write_text(json.dumps(reference_fixture_json))
        rt.pipeline.ingest_extracted_json(src, "cn22-23")
        out = rt.engine.query("credit note number")
        assert out["success"] and out["top_children_chunks"]

    @pytest.mark.smoke
    def test_lfs_stub_still_falls_back(self, tmp_path, monkeypatch):
        """The reference's stub files keep routing to the deterministic
        fallback (graceful degradation, not a crash)."""
        from financial_rag_tpu.models.hashing import HashingEncoder
        from financial_rag_tpu.runtime import Runtime

        stub_dir = tmp_path / "stub"
        stub_dir.mkdir()
        shutil.copy("/root/reference/local_models/BAAI-bge-small-en-v1.5/config.json",
                    stub_dir / "config.json")
        shutil.copy("/root/reference/local_models/BAAI-bge-small-en-v1.5/model.safetensors",
                    stub_dir / "model.safetensors")  # 134-byte LFS pointer
        monkeypatch.setenv("EMBED_BAAI_PATH", str(stub_dir))
        rt = Runtime.build(data_dir=tmp_path / "data")
        assert isinstance(rt.dual_encoder.encoders["baai"], HashingEncoder)
