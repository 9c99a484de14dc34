"""Pallas kernel unit tests vs jnp/numpy references (interpret mode on the
CPU test mesh; the same kernels compile natively on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from financial_rag_tpu.ops import (
    bucketed_topk,
    bucketed_topk_fused,
    flash_attention,
    masked_mean_l2_normalize,
    topk_matmul,
    topk_matmul_reference,
)


def _np_topk(q, x, valid, k):
    """Numpy oracle: exact cosine top-k, ties broken by lower index."""
    s = q.astype(np.float32) @ x.astype(np.float32).T
    s[:, valid == 0] = -np.inf
    order = np.argsort(-s, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(s, order, axis=1), order


class TestPoolNorm:
    @pytest.mark.smoke
    def test_matches_reference(self, rng):
        b, s, h = 5, 64, 384
        hidden = rng.standard_normal((b, s, h)).astype(np.float32)
        mask = np.ones((b, s), np.int32)
        mask[0, 10:] = 0
        mask[3, 1:] = 0
        out = np.asarray(masked_mean_l2_normalize(jnp.asarray(hidden), jnp.asarray(mask)))

        m = mask[:, :, None].astype(np.float32)
        ref = (hidden * m).sum(1) / np.maximum(m.sum(1), 1e-9)
        ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
        np.testing.assert_allclose(out, ref, atol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)

    def test_block_padding(self, rng):
        # batch not a multiple of block_b exercises the pad path
        b, s, h = 3, 32, 128
        hidden = rng.standard_normal((b, s, h)).astype(np.float32)
        mask = np.ones((b, s), np.int32)
        out = np.asarray(masked_mean_l2_normalize(jnp.asarray(hidden), jnp.asarray(mask), block_b=8))
        assert out.shape == (b, h)


class TestTopkMatmul:
    @pytest.mark.parametrize("k", [1, 10, 24, 50])
    def test_exact_vs_numpy_oracle(self, rng, k):
        nq, n, d = 7, 2048, 384
        q = rng.standard_normal((nq, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        x = rng.standard_normal((n, d)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        valid = np.ones(n, np.float32)
        valid[1000:1100] = 0.0

        ref_s, ref_i = _np_topk(q, x, valid, k)
        s, i = topk_matmul(jnp.asarray(q), jnp.asarray(x), jnp.asarray(valid), k, block_n=1024)
        np.testing.assert_array_equal(np.asarray(i), ref_i)
        np.testing.assert_allclose(np.asarray(s), ref_s, atol=1e-5)

    def test_xla_reference_matches_oracle(self, rng):
        nq, n, d, k = 4, 4096, 128, 16
        q = rng.standard_normal((nq, d)).astype(np.float32)
        x = rng.standard_normal((n, d)).astype(np.float32)
        valid = np.ones(n, np.float32)
        ref_s, ref_i = _np_topk(q, x, valid, k)
        s, i = topk_matmul_reference(jnp.asarray(q), jnp.asarray(x), jnp.asarray(valid), k, chunk=1024)
        np.testing.assert_array_equal(np.asarray(i), ref_i)
        np.testing.assert_allclose(np.asarray(s), ref_s, atol=1e-5)

    @pytest.mark.smoke
    def test_tie_breaking_lower_index(self):
        d, n, k = 128, 1024, 4
        x = np.zeros((n, d), np.float32)
        # rows 5, 300, 700 identical -> identical scores; expect index order
        unit = np.ones(d, np.float32) / np.sqrt(d)
        for r in (700, 5, 300):
            x[r] = unit
        q = unit[None, :]
        valid = np.ones(n, np.float32)
        s, i = topk_matmul(jnp.asarray(q), jnp.asarray(x), jnp.asarray(valid), k, block_n=512)
        got = np.asarray(i)[0][:3]
        np.testing.assert_array_equal(got, [5, 300, 700])
        s2, i2 = topk_matmul_reference(jnp.asarray(q), jnp.asarray(x), jnp.asarray(valid), k, chunk=512)
        np.testing.assert_array_equal(np.asarray(i2)[0][:3], [5, 300, 700])

    def test_bf16_corpus(self, rng):
        nq, n, d, k = 3, 1024, 384, 10
        q = rng.standard_normal((nq, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        x = rng.standard_normal((n, d)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        valid = np.ones(n, np.float32)
        xb = jnp.asarray(x, jnp.bfloat16)
        s, i = topk_matmul(jnp.asarray(q), xb, jnp.asarray(valid), k)
        # recall vs f32 oracle should be near-perfect at this scale
        _, ref_i = _np_topk(q, np.asarray(xb, np.float32), valid, k)
        recall = np.mean([len(set(a) & set(b)) / k for a, b in zip(np.asarray(i), ref_i)])
        assert recall >= 0.9

    def test_all_invalid_rows_give_negative(self):
        d, n, k = 128, 512, 5
        q = np.ones((1, d), np.float32)
        x = np.ones((n, d), np.float32)
        valid = np.zeros(n, np.float32)
        s, i = topk_matmul(jnp.asarray(q), jnp.asarray(x), jnp.asarray(valid), k, block_n=512)
        assert np.all(np.asarray(s) < -100.0)


class TestBucketedTopk:
    def test_exact_when_corpus_fits_buckets(self, rng):
        """N <= nbuckets means every column has its own bucket: exact."""
        nq, n, d, k = 5, 2048, 384, 24
        q = rng.standard_normal((nq, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        x = rng.standard_normal((n, d)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        valid = np.ones(n, np.float32)
        valid[100:200] = 0.0
        ref_s, ref_i = _np_topk(q, x, valid, k)
        s, i = bucketed_topk(jnp.asarray(q), jnp.asarray(x), jnp.asarray(valid), k,
                             nbuckets=2048, block_n=1024, block_q=8)
        np.testing.assert_array_equal(np.asarray(i), ref_i)
        np.testing.assert_allclose(np.asarray(s), ref_s, atol=1e-5)

    @pytest.mark.smoke
    def test_fused_matches_unfused(self, rng):
        nq, n, d, k, L = 6, 4096, 128, 12, 2048
        q = rng.standard_normal((nq, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        x = rng.standard_normal((n, d)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        valid = np.ones(n, np.float32)
        valid[50:80] = 0.0
        s1, i1 = bucketed_topk(jnp.asarray(q), jnp.asarray(x), jnp.asarray(valid), k,
                               nbuckets=L, block_n=1024, block_q=8)
        s2, i2 = bucketed_topk_fused(jnp.asarray(q), jnp.asarray(x), jnp.asarray(valid), k,
                                     nbuckets=L, block_n=1024, block_q=8)
        # same candidate sets and scores (ordering of exact ties may differ
        # between the XLA sort and the in-kernel extraction)
        np.testing.assert_allclose(np.sort(np.asarray(s1), axis=1),
                                   np.sort(np.asarray(s2), axis=1), atol=1e-5)
        for a, b in zip(np.asarray(i1), np.asarray(i2)):
            assert set(a.tolist()) == set(b.tolist())

    def test_fused_exact_when_corpus_fits(self, rng):
        nq, n, d, k = 4, 1024, 128, 10
        q = rng.standard_normal((nq, d)).astype(np.float32)
        x = rng.standard_normal((n, d)).astype(np.float32)
        valid = np.ones(n, np.float32)
        ref_s, ref_i = _np_topk(q, x, valid, k)
        s, i = bucketed_topk_fused(jnp.asarray(q), jnp.asarray(x), jnp.asarray(valid), k,
                                   nbuckets=1024, block_n=1024, block_q=8)
        np.testing.assert_array_equal(np.asarray(i), ref_i)

    def test_high_recall_when_bucketed(self, rng):
        """N > nbuckets: recall ~ 1 - k(k-1)/(2L)."""
        nq, n, d, k, L = 8, 8192, 128, 10, 2048
        q = rng.standard_normal((nq, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        x = rng.standard_normal((n, d)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        valid = np.ones(n, np.float32)
        ref_s, ref_i = _np_topk(q, x, valid, k)
        s, i = bucketed_topk(jnp.asarray(q), jnp.asarray(x), jnp.asarray(valid), k,
                             nbuckets=L, block_n=1024, block_q=8)
        recall = np.mean([len(set(a) & set(b)) / k for a, b in zip(np.asarray(i), ref_i)])
        assert recall >= 0.95, recall


class TestPackedTopk:
    """packed_topk_fused — the serving sweep kernel (score + tile id packed
    into one f32 word, single-buffer int max; ops/topk.py)."""

    def _data(self, rng, nq, n, d, dead=None):
        q = rng.standard_normal((nq, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        x = rng.standard_normal((n, d)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        valid = np.ones(n, np.float32)
        if dead:
            valid[dead] = 0.0
        return q, x, valid

    @pytest.mark.smoke
    def test_exact_ids_when_corpus_fits_buckets(self, rng):
        """N == block_n with per_bucket=1: every column is its own bucket,
        so the returned IDS equal the exact oracle; scores match up to the
        documented packing quantum."""
        from financial_rag_tpu.ops.topk import packed_topk_fused
        nq, n, d, k = 5, 1024, 128, 10
        q, x, valid = self._data(rng, nq, n, d, dead=slice(100, 200))
        ref_s, ref_i = _np_topk(q, x, valid, k)
        s, i = packed_topk_fused(jnp.asarray(q), jnp.asarray(x),
                                 jnp.asarray(valid), k, block_n=1024,
                                 per_bucket=1, block_q=8)
        np.testing.assert_array_equal(np.asarray(i), ref_i)
        np.testing.assert_allclose(np.asarray(s), ref_s, atol=2e-4)

    def test_top2_recall_beats_single_bucket(self, rng):
        """per_bucket=2 needs THREE true-top-k collisions in one bucket to
        lose one — recall must beat the single-candidate kernel at equal
        bucket count and clear 0.99 on this shape."""
        from financial_rag_tpu.ops.topk import packed_topk_fused
        nq, n, d, k = 16, 8192, 128, 24
        q, x, valid = self._data(rng, nq, n, d)
        ref_s, ref_i = _np_topk(q, x, valid, k)

        def recall(i):
            return np.mean([len(set(a.tolist()) & set(b.tolist())) / k
                            for a, b in zip(np.asarray(i), ref_i)])

        _, i2 = packed_topk_fused(jnp.asarray(q), jnp.asarray(x),
                                  jnp.asarray(valid), k, block_n=1024,
                                  per_bucket=2, block_q=8)
        _, i1 = packed_topk_fused(jnp.asarray(q), jnp.asarray(x),
                                  jnp.asarray(valid), k, block_n=1024,
                                  per_bucket=1, block_q=8)
        assert recall(i2) >= recall(i1)
        assert recall(i2) >= 0.99

    def test_score_quantization_bound(self, rng):
        """Returned scores differ from the true cosine by at most the
        packing quantum: 2^ceil(log2(ntiles)) low mantissa bits at
        exponent range [2,4) => quantum = ntiles * 2^-22 cosine units."""
        from financial_rag_tpu.ops.topk import packed_topk_fused
        nq, n, d, k = 4, 4096, 128, 8
        q, x, valid = self._data(rng, nq, n, d)
        s, i = packed_topk_fused(jnp.asarray(q), jnp.asarray(x),
                                 jnp.asarray(valid), k, block_n=1024,
                                 per_bucket=2, block_q=8)
        s, i = np.asarray(s), np.asarray(i)
        true = (q @ x.T)[np.arange(nq)[:, None], i]
        quantum = (n // 1024) * 2.0 ** -22
        assert np.abs(s - true).max() <= quantum + 1e-6

    def test_dead_slots_never_returned(self, rng):
        from financial_rag_tpu.ops.topk import packed_topk_fused
        nq, n, d, k = 4, 2048, 64, 10
        q, x, valid = self._data(rng, nq, n, d)
        # make the dead slots the BEST matches so any leak is caught
        x[300:400] = q[0] / np.linalg.norm(q[0])
        valid[300:400] = 0.0
        s, i = packed_topk_fused(jnp.asarray(q), jnp.asarray(x),
                                 jnp.asarray(valid), k, block_n=1024,
                                 per_bucket=2, block_q=8)
        assert not (set(np.asarray(i).ravel().tolist())
                    & set(range(300, 400)))

    def test_all_invalid_gives_sentinels(self, rng):
        from financial_rag_tpu.ops.topk import packed_topk_fused
        d, n, k = 64, 1024, 5
        q = np.ones((2, d), np.float32)
        x = np.ones((n, d), np.float32)
        valid = np.zeros(n, np.float32)
        s, i = packed_topk_fused(jnp.asarray(q), jnp.asarray(x),
                                 jnp.asarray(valid), k, block_n=1024,
                                 per_bucket=2, block_q=8)
        assert np.all(np.asarray(s) < -100.0)
        assert np.all(np.asarray(i) == -1)

    def test_bf16_corpus_and_flat_index_route(self, rng):
        """FlatIndex with a float dtype on the pallas_fused backend must
        route through the packed kernel and return oracle-grade results."""
        import jax
        from financial_rag_tpu.index import FlatIndex
        if jax.default_backend() != "tpu":
            pytest.skip("pallas_fused backend compiles natively on TPU only"
                        " (the kernel itself is covered above in interpret"
                        " mode; FRAG_TEST_TPU=1 runs this route)")
        n, d, k = 2048, 64, 10
        _, x, _ = self._data(rng, 1, n, d)
        idx = FlatIndex(dim=d, capacity=n, backend="pallas_fused")
        idx.upsert(np.arange(1, n + 1, dtype=np.int64), x)
        q = x[:4] + 0.01 * rng.standard_normal((4, d)).astype(np.float32)
        ids, scores = idx.search(q, k)
        assert (ids[np.arange(4), 0] == np.arange(1, 5)).all()


class TestFusedFFN:
    @pytest.mark.smoke
    def test_matches_xla_reference(self, rng):
        from financial_rag_tpu.ops.fused_ffn import fused_ffn

        b, s, h, i = 2, 40, 128, 512
        x = rng.standard_normal((b, s, h)).astype(np.float32)
        w1 = rng.standard_normal((h, i)).astype(np.float32) * 0.05
        b1 = rng.standard_normal(i).astype(np.float32) * 0.05
        w2 = rng.standard_normal((i, h)).astype(np.float32) * 0.05
        b2 = rng.standard_normal(h).astype(np.float32) * 0.05
        got = np.asarray(fused_ffn(jnp.asarray(x), jnp.asarray(w1), jnp.asarray(b1),
                                   jnp.asarray(w2), jnp.asarray(b2), block_t=64))
        import jax.nn

        ref_tanh = np.asarray(jnp.dot(jax.nn.gelu(jnp.dot(jnp.asarray(x), w1) + b1,
                                                  approximate=True), w2) + b2)
        np.testing.assert_allclose(got, ref_tanh, atol=2e-4)
        # close to the exact-erf formulation too
        ref_erf = np.asarray(jnp.dot(jax.nn.gelu(jnp.dot(jnp.asarray(x), w1) + b1,
                                                 approximate=False), w2) + b2)
        np.testing.assert_allclose(got, ref_erf, atol=2e-2)

    def test_gradients_match_xla(self, rng):
        """custom VJP: grads of the fused path match the XLA formulation."""
        import jax

        from financial_rag_tpu.ops.fused_ffn import fused_ffn

        n, h, i = 24, 64, 128
        x = jnp.asarray(rng.standard_normal((n, h)), jnp.float32)
        w1 = jnp.asarray(rng.standard_normal((h, i)) * 0.05, jnp.float32)
        b1 = jnp.asarray(rng.standard_normal(i) * 0.05, jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((i, h)) * 0.05, jnp.float32)
        b2 = jnp.asarray(rng.standard_normal(h) * 0.05, jnp.float32)

        def loss_fused(*args):
            return jnp.sum(fused_ffn(*args, block_t=32) ** 2)

        def loss_xla(x, w1, b1, w2, b2):
            h1 = jax.nn.gelu(x @ w1 + b1, approximate=True)
            return jnp.sum((h1 @ w2 + b2) ** 2)

        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
        g_xla = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
        for gf, gx in zip(g_fused, g_xla):
            np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                                       rtol=1e-3, atol=1e-4)

    def test_training_step_with_fused_ffn(self, rng):
        """the fused path survives jax.grad inside a full train step."""
        import optax

        from financial_rag_tpu.config import ModelConfig
        from financial_rag_tpu.models import random_params
        from financial_rag_tpu.models.bert import bert_encode
        from financial_rag_tpu.training import contrastive_loss

        cfg = ModelConfig(name="tiny", hidden_size=64, num_layers=1, num_heads=4,
                          intermediate_size=128, vocab_size=200, max_position=32)
        params = random_params(cfg, seed=0)
        ids = jnp.asarray(rng.integers(1, 200, (4, 16)), jnp.int32)
        mask = jnp.ones((4, 16), jnp.int32)

        def loss_fn(p):
            e1 = bert_encode(p, ids, mask, config=cfg, pooling="mean",
                             use_fused_ffn=True)
            e2 = bert_encode(p, ids, mask, config=cfg, pooling="mean",
                             use_fused_ffn=True)
            return contrastive_loss(e1, e2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(loss))
        gnorm = float(optax.global_norm(grads))
        assert np.isfinite(gnorm) and gnorm > 0

    def test_model_integration_pallas_vs_xla(self, rng):
        from financial_rag_tpu.config import ModelConfig
        from financial_rag_tpu.models import bert_encode, random_params

        cfg = ModelConfig(name="tiny", hidden_size=128, num_layers=2, num_heads=4,
                          intermediate_size=256, vocab_size=300, max_position=64)
        params = random_params(cfg, seed=0)
        ids = rng.integers(1, 300, size=(2, 48)).astype(np.int32)
        mask = np.ones((2, 48), np.int32)
        a = np.asarray(bert_encode(params, jnp.asarray(ids), jnp.asarray(mask),
                                   config=cfg, pooling="mean", attention_impl="xla"))
        b = np.asarray(bert_encode(params, jnp.asarray(ids), jnp.asarray(mask),
                                   config=cfg, pooling="mean", attention_impl="pallas"))
        cos = (a * b).sum(-1)
        assert cos.min() > 0.99999


class TestFlashAttention:
    def _ref_attention(self, q, k, v, bias, num_heads):
        b, s, h = q.shape
        d = h // num_heads
        qh = q.reshape(b, s, num_heads, d).transpose(0, 2, 1, 3)
        kh = k.reshape(b, s, num_heads, d).transpose(0, 2, 1, 3)
        vh = v.reshape(b, s, num_heads, d).transpose(0, 2, 1, 3)
        scores = np.einsum("bnqd,bnkd->bnqk", qh, kh) / np.sqrt(d)
        scores = scores + bias
        p = np.exp(scores - scores.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        out = np.einsum("bnqk,bnkd->bnqd", p, vh)
        return out.transpose(0, 2, 1, 3).reshape(b, s, h)

    @pytest.mark.smoke
    def test_matches_reference(self, rng):
        b, s, h, nh = 2, 64, 384, 12
        q = rng.standard_normal((b, s, h)).astype(np.float32)
        k = rng.standard_normal((b, s, h)).astype(np.float32)
        v = rng.standard_normal((b, s, h)).astype(np.float32)
        mask = np.ones((b, s), np.int32)
        mask[0, 40:] = 0
        bias = np.where(mask[:, None, None, :] > 0, 0.0, -1e9).astype(np.float32)

        out = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                         jnp.asarray(bias), num_heads=nh))
        ref = self._ref_attention(q, k, v, bias, nh)
        # padded key positions masked; compare only valid query rows
        np.testing.assert_allclose(out[0, :40], ref[0, :40], atol=2e-5)
        np.testing.assert_allclose(out[1], ref[1], atol=2e-5)

    def test_model_integration(self, rng):
        """bert_forward with attention_impl='pallas' equals 'xla'."""
        from financial_rag_tpu.config import ModelConfig
        from financial_rag_tpu.models import bert_forward, random_params

        cfg = ModelConfig(name="tiny", hidden_size=128, num_layers=2, num_heads=4,
                          intermediate_size=256, vocab_size=200, max_position=64)
        params = random_params(cfg, seed=0)
        ids = rng.integers(1, 200, size=(2, 48)).astype(np.int32)
        mask = np.ones((2, 48), np.int32)
        mask[1, 30:] = 0
        a = np.asarray(bert_forward(params, jnp.asarray(ids), jnp.asarray(mask), config=cfg, attention_impl="xla"))
        b = np.asarray(bert_forward(params, jnp.asarray(ids), jnp.asarray(mask), config=cfg, attention_impl="pallas"))
        m = mask.astype(bool)
        np.testing.assert_allclose(a[m], b[m], atol=3e-5)

    def test_gradients_match_xla_attention(self, rng):
        """Custom VJP: grads of the fused kernel wrt q/k/v must equal the
        XLA attention gradients (VERDICT r1 #9 — training runs the fused
        path end-to-end)."""
        from financial_rag_tpu.models.bert import _attention_xla

        b, s, h, nh = 2, 32, 128, 4
        q = jnp.asarray(rng.standard_normal((b, s, h)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((b, s, h)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((b, s, h)).astype(np.float32))
        mask = np.ones((b, s), np.int32)
        mask[1, 20:] = 0
        bias = jnp.asarray(np.where(mask[:, None, None, :] > 0, 0.0, -1e9)
                           .astype(np.float32))
        # weighted sum -> non-trivial cotangents on every output element
        w = jnp.asarray(rng.standard_normal((b, s, h)).astype(np.float32))

        def loss_pallas(q, k, v):
            return jnp.sum(w * flash_attention(q, k, v, bias, num_heads=nh))

        def loss_xla(q, k, v):
            return jnp.sum(w * _attention_xla(q, k, v, bias, num_heads=nh))

        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
        gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gp, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=3e-4, rtol=1e-3)

    def test_train_step_through_pallas_attention(self, rng):
        """Contrastive train step compiled with attention_impl='pallas'
        takes a finite-loss step (custom VJP exercised inside value_and_grad
        under jit)."""
        import jax as _jax

        from financial_rag_tpu.config import ModelConfig
        from financial_rag_tpu.models import random_params
        from financial_rag_tpu.parallel.mesh import train_mesh
        from financial_rag_tpu.training import make_train_step

        cfg = ModelConfig(name="tiny", hidden_size=128, num_layers=2, num_heads=4,
                          intermediate_size=256, vocab_size=200, max_position=64)
        params = random_params(cfg, seed=0)
        mesh = train_mesh(tp=1, devices=_jax.devices()[:2])
        step, init_state = make_train_step(cfg, mesh, attention_impl="pallas")
        params, opt_state = init_state(params)
        batch = {
            "q_ids": jnp.asarray(rng.integers(1, 200, size=(4, 32)).astype(np.int32)),
            "q_mask": jnp.asarray(np.ones((4, 32), np.int32)),
            "d_ids": jnp.asarray(rng.integers(1, 200, size=(4, 32)).astype(np.int32)),
            "d_mask": jnp.asarray(np.ones((4, 32), np.int32)),
        }
        with mesh:
            params2, opt_state, loss = step(params, opt_state, batch)
        assert np.isfinite(float(loss))
        # params actually moved
        moved = np.abs(np.asarray(params2["embeddings"]["word"])
                       - np.asarray(params["embeddings"]["word"])).max()
        assert moved > 0


class TestProbeScores:
    """ops/ivf_probe.py: fused IVF gather+score kernel vs a numpy oracle."""

    def _oracle(self, q, storage, w, probes):
        b, p = probes.shape
        L = storage.shape[1]
        ref = np.empty((b, p, L), np.float32)
        for bi in range(b):
            for pi in range(p):
                li = probes[bi, pi]
                s = q[bi].astype(np.float32) @ storage[li].astype(np.float32).T
                ref[bi, pi] = s * w[li] + (w[li] > 0) * 1e5 - 1e5
        return ref

    @pytest.mark.smoke
    def test_matches_oracle_with_empty_slots(self, rng):
        from financial_rag_tpu.ops.ivf_probe import probe_scores

        nlist, L, d, b, p = 8, 128, 384, 5, 3
        storage = rng.standard_normal((nlist, L, d)).astype(np.float32)
        w = (rng.random((nlist, L)) > 0.3).astype(np.float32)
        q = rng.standard_normal((b, d)).astype(np.float32)
        probes = rng.integers(0, nlist, size=(b, p)).astype(np.int32)
        out = np.asarray(probe_scores(
            jnp.asarray(q), jnp.asarray(storage), jnp.asarray(w), jnp.asarray(probes)))
        ref = self._oracle(q, storage, w, probes)
        np.testing.assert_allclose(out, ref, atol=2e-2)
        # empty slots are pushed far below any real cosine score
        assert (out[ref <= -9e4] < -9e4).all()

    def test_int8_storage_dequantizes(self, rng):
        from financial_rag_tpu.ops.ivf_probe import probe_scores
        from financial_rag_tpu.ops.topk import quantize_queries
        from financial_rag_tpu.index.persist import encode_payload

        nlist, L, d, b, p = 4, 128, 128, 3, 2
        unit = rng.standard_normal((nlist * L, d)).astype(np.float32)
        unit /= np.linalg.norm(unit, axis=1, keepdims=True)
        payload, w2d = encode_payload(unit, jnp.int8)
        storage = np.asarray(payload).reshape(nlist, L, d)
        w = w2d.reshape(nlist, L)
        q = rng.standard_normal((b, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        probes = rng.integers(0, nlist, size=(b, p)).astype(np.int32)

        qq, qscale = quantize_queries(jnp.asarray(q), jnp.int8)
        raw = np.asarray(probe_scores(
            qq, jnp.asarray(storage), jnp.asarray(w), jnp.asarray(probes)))
        out = raw * np.asarray(qscale)[:, :, None]

        ref = np.empty_like(out)
        for bi in range(b):
            for pi in range(p):
                li = probes[bi, pi]
                ref[bi, pi] = q[bi] @ unit[li * L:(li + 1) * L].T
        # per-vector int8 quantization keeps cosine scores within ~1%
        np.testing.assert_allclose(out, ref, atol=2e-2)

    def test_reference_matches_kernel(self, rng):
        from financial_rag_tpu.ops.ivf_probe import probe_scores, probe_scores_reference

        nlist, L, d, b, p = 6, 128, 256, 4, 5
        storage = rng.standard_normal((nlist, L, d)).astype(np.float32)
        w = (rng.random((nlist, L)) > 0.2).astype(np.float32)
        q = rng.standard_normal((b, d)).astype(np.float32)
        probes = rng.integers(0, nlist, size=(b, p)).astype(np.int32)
        a = np.asarray(probe_scores(
            jnp.asarray(q), jnp.asarray(storage), jnp.asarray(w), jnp.asarray(probes)))
        r = np.asarray(probe_scores_reference(
            jnp.asarray(q), jnp.asarray(storage), jnp.asarray(w), jnp.asarray(probes)))
        np.testing.assert_allclose(a, r, atol=2e-2)


class TestCausalFlashPrefill:
    """Oracle parity for the decoder-prefill flash kernel
    (ops/causal_flash.py): blockwise online softmax vs a dense masked
    reference, over GQA grouping, left padding, and block shapes."""

    @staticmethod
    def _oracle(q, k, v, pad, hq_heads, hkv_heads):
        b, s, _ = q.shape
        d = q.shape[2] // hq_heads
        q4 = np.asarray(q, np.float32).reshape(b, s, hq_heads, d)
        k4 = np.asarray(k, np.float32).reshape(b, s, hkv_heads, d)
        v4 = np.asarray(v, np.float32).reshape(b, s, hkv_heads, d)
        g = hq_heads // hkv_heads
        out = np.zeros((b, s, hq_heads, d), np.float32)
        for bi in range(b):
            for h in range(hq_heads):
                kv = h // g
                sc = q4[bi, :, h] @ k4[bi, :, kv].T / np.sqrt(d)
                pos = np.arange(s)
                allow = (pos[None, :] <= pos[:, None]) & (pos[None, :] >= pad[bi])
                sc = np.where(allow, sc, -1e30)
                sc = sc - sc.max(axis=-1, keepdims=True)
                p = np.exp(sc)
                p /= p.sum(axis=-1, keepdims=True)
                out[bi, :, h] = p @ v4[bi, :, kv]
        return out.reshape(b, s, hq_heads * d)

    @pytest.mark.parametrize("b,s,hq,hkv,d,bq,bk", [
        (2, 128, 4, 2, 32, 64, 64),     # GQA, multiple tiles both axes
        (1, 256, 14, 2, 64, 128, 128),  # the Qwen2-0.5B head geometry
        (2, 256, 8, 8, 32, 256, 64),    # MHA, single q tile
    ])
    def test_matches_dense_oracle(self, b, s, hq, hkv, d, bq, bk):
        from financial_rag_tpu.ops import causal_flash_prefill
        rng = np.random.default_rng(hash((b, s, hq)) % 2**31)
        q = jnp.asarray(rng.standard_normal((b, s, hq * d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, s, hkv * d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, s, hkv * d)), jnp.float32)
        pad = rng.integers(0, s // 2, b).astype(np.int32)
        got = np.asarray(causal_flash_prefill(
            q, k, v, jnp.asarray(pad), num_q_heads=hq, num_kv_heads=hkv,
            block_q=bq, block_k=bk))
        want = self._oracle(q, k, v, pad, hq, hkv)
        for bi in range(b):   # rows inside the pad are unread by contract
            np.testing.assert_allclose(got[bi, pad[bi]:], want[bi, pad[bi]:],
                                       rtol=2e-5, atol=2e-5)

    def test_resolver_gates(self):
        from financial_rag_tpu.models.decoder import (DecoderConfig,
                                                      resolve_prefill_impl)
        qwen = DecoderConfig(vocab_size=1000, num_layers=2, hidden_size=896,
                             num_heads=14, num_kv_heads=2,
                             intermediate_size=128)
        # CPU backend in tests -> always xla, regardless of shape
        assert resolve_prefill_impl(qwen, 4096) == "xla"
