"""Multi-device sharding tests on the 8-device virtual CPU mesh.

Strategy per SURVEY.md section 4: validate that the TP+FSDP GSPMD shardings
compute the SAME numbers as the unsharded model (collective correctness), not
just that they compile.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tdc_video_tpu.config import tdc_tiny
from tdc_video_tpu.model import init_tdc, tdc_loss
from tdc_video_tpu.parallel.mesh import auto_mesh_shape, make_mesh
from tdc_video_tpu.parallel.sharding import (
    batch_spec,
    lm_param_spec,
    shard_tree,
    tdc_param_spec,
    to_named,
)


def _batch(cfg, B, T=4, L=24):
    rng = np.random.default_rng(0)
    s, d = cfg.siglip.image_size, cfg.dino.image_size
    labels = np.full((B, L), -100, np.int32)
    labels[:, 12:] = rng.integers(2, 100, (B, L - 12))
    return {
        "input_ids": jnp.asarray(rng.integers(2, 100, (B, L)), jnp.int32),
        "labels": jnp.asarray(labels),
        "image_pos": jnp.full((B,), 5, jnp.int32),
        "siglip_px": jnp.asarray(rng.normal(0, 1, (B, T, s, s, 3)), jnp.float32),
        "dino_px": jnp.asarray(rng.normal(0, 1, (B, T, d, d, 3)), jnp.float32),
        "frame_mask": jnp.ones((B, T), jnp.bool_),
        "qformer_text_ids": jnp.asarray(rng.integers(1, 50, (B, 6)), jnp.int32),
        "qformer_text_mask": jnp.ones((B, 6), jnp.bool_),
    }


class TestMeshShape:
    def test_auto_shape(self):
        assert auto_mesh_shape(8, 4) == (2, 4)
        assert auto_mesh_shape(8, 2) == (4, 2)
        assert auto_mesh_shape(8, 7) == (8, 1)
        assert auto_mesh_shape(4, 8) == (1, 4)


class TestShardedParity:
    def test_loss_matches_unsharded(self):
        cfg = tdc_tiny()
        params = init_tdc(jax.random.PRNGKey(0), cfg)
        batch = _batch(cfg, B=4)

        ref = float(tdc_loss(cfg, params, batch, max_len=128, max_visual_len=64, remat=False))

        n_data, n_model = auto_mesh_shape(8, cfg.lm.num_kv_heads)
        mesh = make_mesh(n_data, n_model)
        p_spec = tdc_param_spec(params, fsdp_size=n_data)
        b_spec = batch_spec(batch)
        sp = shard_tree(params, p_spec, mesh)
        sb = shard_tree(batch, b_spec, mesh)

        fn = jax.jit(
            lambda p, b: tdc_loss(cfg, p, b, max_len=128, max_visual_len=64, remat=False),
            in_shardings=(to_named(p_spec, mesh), to_named(b_spec, mesh)),
        )
        with mesh:
            got = float(fn(sp, sb))
        assert np.isclose(got, ref, rtol=2e-4), (got, ref)

    def test_spec_assignments(self):
        cfg = tdc_tiny()
        params = init_tdc(jax.random.PRNGKey(1), cfg)
        spec = lm_param_spec(params["lm"], fsdp_size=2)
        # layer axis sharded over data (2 layers % 2 == 0)
        assert spec["layers"]["q_proj"]["w"] == jax.sharding.PartitionSpec(
            "data", None, "model"
        )
        assert spec["layers"]["o_proj"]["w"] == jax.sharding.PartitionSpec(
            "data", "model", None
        )
        assert spec["layers"]["mlp"]["down"]["w"] == jax.sharding.PartitionSpec(
            "data", "model", None
        )
        assert spec["embed"]["embedding"] == jax.sharding.PartitionSpec("model", None)
        # norms replicated along features
        assert spec["layers"]["input_norm"]["scale"] == jax.sharding.PartitionSpec(
            "data", None
        )


class TestGraftEntry:
    def test_dryrun_multichip(self):
        import __graft_entry__ as g

        g.dryrun_multichip(8)

    def test_entry_traces(self):
        """entry() must be jit-traceable (shape/type correctness) — the 3B
        flagship is too big to execute on CPU here; the driver runs it on
        the real chip."""
        import __graft_entry__ as g

        fn, (params, batch) = g.entry()
        out = jax.eval_shape(fn, params, batch)
        assert out.shape[0] == 1 and out.shape[-1] == 128256


class TestSequenceParallel:
    def test_sp_forward_matches_unsharded(self):
        """Sequence-sharded prefill must produce the same logits."""
        import numpy as np

        from tdc_video_tpu.config import LM_TINY
        from tdc_video_tpu.models.lm import init_lm, lm_forward

        params = init_lm(jax.random.PRNGKey(0), LM_TINY)
        ids = jnp.asarray(np.random.default_rng(0).integers(2, 500, (2, 64)), jnp.int32)
        ref = lm_forward(LM_TINY, params, input_ids=ids, dtype=jnp.float32)

        mesh = make_mesh(4, 2)
        fn = jax.jit(
            lambda p, i: lm_forward(LM_TINY, p, input_ids=i, seq_axis="data", dtype=jnp.float32)
        )
        with mesh:
            got = fn(params, ids)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


class TestTPServing:
    """Tensor-parallel serving: prefill + greedy decode over the `model` axis
    must be token-identical to unsharded decode — bf16 and weight-only int8
    (the 7B single-chip-OOM deployment path, PERF.md)."""

    @pytest.mark.parametrize("quantize", [False, True])
    def test_tp_decode_matches_unsharded(self, quantize):
        import dataclasses

        from tdc_video_tpu.config import tdc_tiny
        from tdc_video_tpu.models import lm as lm_mod
        from tdc_video_tpu.parallel.mesh import make_mesh
        from tdc_video_tpu.parallel.sharding import lm_param_spec, shard_tree, to_named
        from tdc_video_tpu.serving.generate import generate_text_only

        cfg = tdc_tiny()
        lm_params = lm_mod.init_lm(jax.random.PRNGKey(0), cfg.lm, dtype=jnp.float32)
        if quantize:
            from tdc_video_tpu.models.quant import quantize_lm_int8

            lm_params = quantize_lm_int8(lm_params)
        params = {"lm": lm_params}
        rng = np.random.default_rng(3)
        ids = jnp.asarray(rng.integers(2, 90, (1, 9)), jnp.int32)
        mask = jnp.ones(ids.shape, jnp.bool_)

        ref = np.asarray(generate_text_only(cfg, params, ids, mask, max_new_tokens=8))

        mesh = make_mesh(4, 2)
        spec = {"lm": lm_param_spec(lm_params)}
        sharded = {"lm": shard_tree(lm_params, spec["lm"], mesh)}
        jgen = jax.jit(
            lambda p, i, m: generate_text_only(cfg, p, i, m, max_new_tokens=8),
            in_shardings=(to_named(spec, mesh), None, None),
        )
        with mesh:
            out = jgen(sharded, ids, mask)
        np.testing.assert_array_equal(np.asarray(out), ref)


class TestShardedEncode:
    """Multi-chip single-video ingest: StreamingEncoder(mesh=...) shards the
    chunk frame axis over the mesh "data" axis (serving/streaming.py) — the
    v5e-8 scaling path for the BASELINE north star."""

    def test_sharded_encode_matches_unsharded(self):
        from tdc_video_tpu.serving.streaming import StreamingEncoder

        cfg = tdc_tiny()
        params = init_tdc(jax.random.PRNGKey(0), cfg)
        mesh = make_mesh(8, 1)
        rng = np.random.default_rng(9)
        T = 8
        sig = jnp.asarray(
            rng.normal(0, 1, (T, cfg.siglip.image_size, cfg.siglip.image_size, 3)),
            jnp.float32,
        )
        dino = jnp.asarray(
            rng.normal(0, 1, (T, cfg.dino.image_size, cfg.dino.image_size, 3)),
            jnp.float32,
        )
        plain = StreamingEncoder(cfg, params, chunk_frames=T, device_prep=False)
        sharded = StreamingEncoder(
            cfg, params, chunk_frames=T, device_prep=False, mesh=mesh
        )
        ref, refd = plain._encode(params, sig, dino)
        got, gotd = sharded._encode(params, sig, dino)
        # per-frame compute: sharding must not change the numbers
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(gotd), np.asarray(refd), rtol=2e-5, atol=2e-5)
        # and the outputs actually live distributed over the mesh
        assert len(got.sharding.device_set) == 8

    def test_chunk_not_divisible_raises(self):
        from tdc_video_tpu.serving.streaming import StreamingEncoder

        cfg = tdc_tiny()
        params = init_tdc(jax.random.PRNGKey(0), cfg)
        mesh = make_mesh(8, 1)
        with pytest.raises(ValueError):
            StreamingEncoder(cfg, params, chunk_frames=12, mesh=mesh)


class TestTPEngine:
    """Tensor-parallel continuous batching: DecodeEngine(mesh=...) shards the
    KV cache over the same `model` axis as the attention heads
    (parallel.sharding.kv_cache_spec) — multi-request serving of models too
    big for one chip.  Outputs must stay token-identical to the single-device
    engine."""

    def _setup(self):
        from tdc_video_tpu.models import lm as lm_mod

        cfg = tdc_tiny()
        lm_params = lm_mod.init_lm(jax.random.PRNGKey(0), cfg.lm, dtype=jnp.float32)
        return cfg, {"lm": lm_params}

    def _req(self, cfg, params, ids, max_new, with_pids=False):
        from tdc_video_tpu.models import lm as lm_mod
        from tdc_video_tpu.serving.batching import Request

        ids = jnp.asarray(np.asarray(ids)[None], jnp.int32)
        embeds = lm_mod.embed_tokens(cfg.lm, params["lm"], ids, cfg.dtype)
        return Request(
            embeds=embeds, attn_mask=jnp.ones(ids.shape, bool),
            max_new_tokens=max_new, uid=tuple(np.asarray(ids[0])),
            prompt_ids=np.asarray(ids[0]) if with_pids else None,
        )

    @pytest.mark.parametrize("spec_window,prefill_chunk", [(0, 0), (4, 0), (0, 4)])
    def test_tp_engine_matches_plain(self, spec_window, prefill_chunk):
        from tdc_video_tpu.serving.batching import DecodeEngine

        cfg, params = self._setup()
        mesh = make_mesh(4, 2)
        sharded = {"lm": shard_tree(params["lm"], lm_param_spec(params["lm"]), mesh)}
        rng = np.random.default_rng(31)
        prompts = [rng.integers(2, 90, 9), np.asarray([4, 9, 17] * 4)]

        def run(p, m):
            eng = DecodeEngine(
                cfg, p, num_slots=2, capacity=64, chunk_tokens=4,
                spec_window=spec_window, prefill_chunk=prefill_chunk, mesh=m,
            )
            for ids in prompts:
                eng.submit(self._req(cfg, p, ids, 10, with_pids=spec_window > 0))
            return {r.uid: r.tokens for r in eng.run()}

        plain = run(params, None)
        with mesh:
            tp = run(sharded, mesh)
        assert tp == plain
        # the TP engine's cache must actually be distributed
        # (replicated-cache TP would silently burn HBM x mesh size)

    def test_tp_engine_cache_is_sharded(self):
        from tdc_video_tpu.serving.batching import DecodeEngine

        cfg, params = self._setup()
        mesh = make_mesh(4, 2)
        sharded = {"lm": shard_tree(params["lm"], lm_param_spec(params["lm"]), mesh)}
        eng = DecodeEngine(cfg, sharded, num_slots=2, capacity=64, mesh=mesh)
        from jax.sharding import PartitionSpec as P

        assert eng.cache["k"].sharding.spec == P(None, None, None, "model", None)
        assert len(eng.cache["k"].sharding.device_set) == 8

    def test_tp_engine_int8_kv(self):
        from tdc_video_tpu.serving.batching import DecodeEngine

        cfg, params = self._setup()
        mesh = make_mesh(4, 2)
        sharded = {"lm": shard_tree(params["lm"], lm_param_spec(params["lm"]), mesh)}
        ids = np.asarray([5, 11, 29] * 3)
        plain = DecodeEngine(cfg, params, num_slots=1, capacity=64, kv_quant="int8")
        plain.submit(self._req(cfg, params, ids, 10))
        ref = plain.run()[0].tokens
        with mesh:
            tp = DecodeEngine(
                cfg, sharded, num_slots=1, capacity=64, kv_quant="int8", mesh=mesh
            )
            tp.submit(self._req(cfg, sharded, ids, 10))
            got = tp.run()[0].tokens
        assert got == ref
