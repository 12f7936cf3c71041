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


class TestStage3AudioLoRAMesh:
    """The reference stage-3 configuration — BEATs audio in-graph + LoRA
    masked optimizer (scripts/stage3/train_video_audio_qwen_lora.sh:8-9,
    56-61) — running under the TP+FSDP mesh.  Sharded losses must equal the
    single-device trainer's, and the LoRA update invariants (base LM frozen,
    deltas moving) must hold under sharding."""

    def _audio_batch(self, cfg, B, T=4, L=24, key=0):
        from tdc_video_tpu.constants import IGNORE_INDEX

        rng = np.random.default_rng(key)
        s, d = cfg.siglip.image_size, cfg.dino.image_size
        labels = np.full((B, L), IGNORE_INDEX, np.int32)
        labels[:, 10:] = rng.integers(2, 100, (B, L - 10))
        W = 2
        S = W * 10
        return {
            "input_ids": np.asarray(rng.integers(2, 100, (B, L)), np.int32),
            "labels": labels,
            "image_pos": np.full((B,), 5, np.int32),
            "text_len": np.full((B,), L, np.int32),
            "has_image": np.ones((B,), bool),
            "siglip_px": rng.normal(0, 1, (B, T, s, s, 3)).astype(np.float32),
            "dino_px": rng.normal(0, 1, (B, T, d, d, 3)).astype(np.float32),
            "frame_mask": np.ones((B, T), bool),
            "qformer_text_ids": rng.integers(1, 50, (B, 6)).astype(np.int32),
            "qformer_text_mask": np.ones((B, 6), bool),
            "audio_windows": rng.normal(0, 0.05, (B, W, 160000)).astype(np.float32),
            "audio_wmask": np.ones((B, W, 160000), bool),
            "audio_frame_of_sec": np.clip(np.arange(S) // 2, 0, T - 1)[None]
            .repeat(B, 0)
            .astype(np.int32),
            "audio_group_pos": (np.arange(S) % 2)[None].repeat(B, 0).astype(np.int32),
            "audio_group_size": np.full((B, T), 2, np.int32),
            "audio_sec_valid": np.ones((B, S), bool),
        }

    def _trainer(self, cfg, params, outdir, mesh):
        from tdc_video_tpu.train.trainer import TrainConfig, Trainer

        tcfg = TrainConfig(
            output_dir=outdir,
            learning_rate=1e-3,
            lora_enable=True,
            lora_r=4,
            lora_alpha=8,
            gradient_accumulation_steps=1,
            # audio emits ~50 tokens/frame: the visual budget must hold all
            # T*50+ctx tokens or audio_proj gets no gradient (truncated away)
            model_max_length=512,
            max_visual_len=400,
        )
        return Trainer(cfg, tcfg, params, total_steps=3, mesh=mesh)

    @pytest.mark.slow
    def test_sharded_stage3_matches_unsharded(self, tmp_path):
        cfg = tdc_tiny(audio=True)
        # host copies per trainer: train_step donates its param buffers, so
        # two Trainers must not share device arrays
        params = jax.tree_util.tree_map(
            np.asarray, init_tdc(jax.random.PRNGKey(0), cfg)
        )
        batches = [self._audio_batch(cfg, B=4, key=k) for k in range(2)]

        solo = self._trainer(
            cfg, jax.tree_util.tree_map(np.copy, params),
            str(tmp_path / "solo"), make_mesh(1, 1),
        )
        solo_losses = [float(solo.train_step(b)) for b in batches]

        n_data, n_model = auto_mesh_shape(8, cfg.lm.num_kv_heads)
        mesh = make_mesh(n_data, n_model)
        tr = self._trainer(cfg, params, str(tmp_path / "mesh"), mesh)
        lm_w0 = np.asarray(tr.params["lm"]["layers"]["q_proj"]["w"]).copy()
        beats0 = [
            np.asarray(x).copy()
            for x in jax.tree_util.tree_leaves(tr.params["beats"])
        ]
        ap0 = [
            np.asarray(x).copy()
            for x in jax.tree_util.tree_leaves(tr.params["audio_proj"])
        ]
        b0 = np.asarray(tr.lora["layers/q_proj/w"]["b"]).copy()

        mesh_losses = [float(tr.train_step(b)) for b in batches]
        for got, ref in zip(mesh_losses, solo_losses):
            assert np.isfinite(got)
            np.testing.assert_allclose(got, ref, rtol=2e-4)

        # LoRA invariants survive sharding: base LM untouched, delta moved
        np.testing.assert_array_equal(
            lm_w0, np.asarray(tr.params["lm"]["layers"]["q_proj"]["w"])
        )
        assert np.abs(np.asarray(tr.lora["layers/q_proj/w"]["b"]) - b0).max() > 0
        # stage-3 freeze policy: BEATs stays frozen under the mesh...
        for before, after in zip(
            beats0, jax.tree_util.tree_leaves(tr.params["beats"])
        ):
            np.testing.assert_array_equal(before, np.asarray(after))
        # ...while audio_proj trains through the sharded in-graph BEATs
        moved = any(
            np.abs(np.asarray(after) - before).max() > 0
            for before, after in zip(
                ap0, jax.tree_util.tree_leaves(tr.params["audio_proj"])
            )
        )
        assert moved, "audio_proj did not move under the sharded stage-3 step"


class TestMeshPredictor:
    """TDCPredictor(mesh=...) — the cli/serve.py --mesh path: frames shard
    over `data` for tower encode, the LM shards over `model` for TP
    prefill/decode, answer_many's engine shards its KV cache.  Every answer
    must be token-identical to the single-device predictor."""

    @pytest.mark.slow
    def test_mesh_predictor_matches_plain(self, tmp_path):
        import sys as _sys
        import os as _os

        _sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
        from test_builder import write_checkpoint
        from test_eval import SimpleTokenizer

        from tdc_video_tpu.builder import load_pretrained_model
        from tdc_video_tpu.eval.runner import TDCPredictor

        ckpt = str(tmp_path / "ckpt")
        write_checkpoint(ckpt, tdc_tiny(), audio=False)
        _, model, _, _ = load_pretrained_model(ckpt, load_tokenizer=False)

        rng = np.random.default_rng(11)
        frames = rng.integers(0, 255, (5, 48, 64, 3)).astype(np.uint8)
        questions = ["What is shown?", "What color dominates?"]

        def make(mesh):
            return TDCPredictor(
                model.cfg, model.params, SimpleTokenizer(), max_new_tokens=4,
                text_bucket=128, mesh=mesh,
            )

        plain = make(None)
        ref_solo = plain.answer(frames, questions[0], video_uid="v")
        ref_many = plain.answer_many(frames, questions, video_uid="v",
                                     num_slots=2)

        mesh = make_mesh(*auto_mesh_shape(8, tdc_tiny().lm.num_kv_heads))
        mp = make(mesh)
        # params really are distributed (TP LM + replicated towers)
        assert len(mp.params["lm"]["layers"]["q_proj"]["w"].sharding.device_set) == 8
        assert mp.params["lm"]["layers"]["q_proj"]["w"].sharding.spec != (
            jax.sharding.PartitionSpec()
        )
        assert mp.answer(frames, questions[0], video_uid="v") == ref_solo
        assert mp.answer_many(frames, questions, video_uid="v",
                              num_slots=2) == ref_many
        # the per-frame tower features were computed frame-sharded
        _, (ff, _, _, _) = mp._feat_cache
        assert len(ff.sharding.device_set) == 8

    @pytest.mark.slow
    def test_bucket_not_divisible_by_data_axis(self, tmp_path):
        """A data axis that does not divide the frame bucket (3 devices,
        bucket 8) must not crash jit with uneven in_shardings: encode_video
        rounds the bucket up to a multiple of the axis (8 -> 9) and the pad
        frame is masked out, so answers stay identical to single-device."""
        import sys as _sys
        import os as _os

        _sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
        from test_builder import write_checkpoint
        from test_eval import SimpleTokenizer

        from tdc_video_tpu.builder import load_pretrained_model
        from tdc_video_tpu.eval.runner import TDCPredictor

        ckpt = str(tmp_path / "ckpt")
        write_checkpoint(ckpt, tdc_tiny(), audio=False)
        _, model, _, _ = load_pretrained_model(ckpt, load_tokenizer=False)

        rng = np.random.default_rng(7)
        frames = rng.integers(0, 255, (5, 48, 64, 3)).astype(np.uint8)

        plain = TDCPredictor(model.cfg, model.params, SimpleTokenizer(),
                             max_new_tokens=4, text_bucket=128)
        ref = plain.answer(frames, "What is shown?", video_uid="v")

        mesh = make_mesh(3, 1)  # 3 does not divide any frame bucket
        mp = TDCPredictor(model.cfg, model.params, SimpleTokenizer(),
                          max_new_tokens=4, text_bucket=128, mesh=mesh)
        assert mp.answer(frames, "What is shown?", video_uid="v") == ref
        _, (ff, _, fmask, T) = mp._feat_cache
        assert T % 3 == 0 and fmask.sum() == 5
        assert len(ff.sharding.device_set) == 3


class TestWarmupCollectives:
    def test_single_process_noop(self):
        """warmup_collectives must be free in single-process runs (tests,
        dryrun, single-host serving): no compiles, no arrays, immediate
        return.  The multi-process behavior (serial clique rendezvous) is
        exercised for real by tests/test_multiprocess.py via
        Trainer.__init__."""
        from tdc_video_tpu.parallel.mesh import warmup_collectives

        mesh = make_mesh(4, 2)
        n_before = len(jax.live_arrays())
        warmup_collectives(mesh)  # process_count()==1 here
        assert len(jax.live_arrays()) == n_before
