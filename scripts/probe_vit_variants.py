"""Probe ViT-block optimizations for the ingest path (VERDICT r4: raise
bf16 ingest MFU past 50%).

Profile decomposition (scripts/profile_ingest.py @224px/8-frame clips):
preprocess 1.7 ms + ViT 17.1 ms (97 TF/s) + memory 1.9 ms + ~3.8 ms glue
= 24.5 ms. Candidates measured here, each as a chained scan-in-jit:

  base     — qwen_vit_blocks_frames as shipped (3 separate QKV matmuls,
             one flash_attention call per stream per layer)
  fusedqkv — one [St, 3D] QKV projection per stream, split after
  combqkv  — ONE [St, 3D] QKV projection over BOTH streams concatenated
             (the small stream's 256-row matmuls fold into the big one),
             attention still per stream (no padding waste)
  onecall  — fused QKV + BOTH streams padded into ONE attention call
             (small-stream frames pad 64->256 tokens; attention is 2.7% of
             FLOPs so 4x waste there is cheap if it halves call overhead)
  xlaattn  — fused QKV + plain XLA attention (no Pallas) at these tiny
             shapes (S=256/64 per frame)

The remote compile service can be contended (a trivial compile once took
230 s) and long compiles can die with a broken pipe around the ~30 min
mark, so each mode compiles as its own program, --modes picks a subset,
and transport failures retry with the persistent compile cache keeping any
finished compiles.

Usage: python scripts/probe_vit_variants.py [--modes a,b] [--iters 20]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--side", type=int, default=224)
    ap.add_argument("--clip", type=int, default=8)
    ap.add_argument("--modes", type=str,
                    default="combqkv,fusedqkv,base,xlaattn,onecall")
    ap.add_argument("--retries", type=int, default=4)
    ap.add_argument("--head-block", type=int, default=8,
                    help="frame-kernel heads per program (framekernel mode)")
    ap.add_argument("--int8-weight-only", action="store_true",
                    help="int8 weights WITHOUT w8a8 (bf16 MXU, int8 HBM "
                         "reads): isolates the activation-quantization + "
                         "int8-MXU delta from the weight-read delta")
    ap.add_argument("--int8", action="store_true",
                    help="quantize the blocks to int8 + enable w8a8 "
                         "(int8xint8 MXU) — re-runs the variant sweep under "
                         "the int8 rates (VERDICT r4 next #6)")
    ap.add_argument("--single-layer", action="store_true",
                    help="time ONE block body chained over 32*iters scan "
                         "steps instead of the full 32-layer stack: the "
                         "compiled program is ~32x smaller (a contended "
                         "remote compile service drops >30min compiles), "
                         "and per-layer cost x num_layers approximates the "
                         "full encode for VARIANT COMPARISON")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from flash_vstream_tpu.core.config import QWEN2_VL_VIT
    from flash_vstream_tpu.core.runtime_setup import enable_compilation_cache
    from flash_vstream_tpu.kernels.flash_attention import (flash_attention,
                                                           xla_attention)
    from flash_vstream_tpu.models.layers import (apply_rope, dense,
                                                 gelu_mlp, layer_norm)
    from flash_vstream_tpu.models.qwen2_vit import (grid_positions,
                                                    init_qwen_vit_params,
                                                    qwen_vit_blocks_frames,
                                                    vision_rope_angles)

    enable_compilation_cache()
    cfg = QWEN2_VL_VIT
    D, I, H, hd = (cfg.hidden_size, cfg.intermediate_size, cfg.num_heads,
                   cfg.head_dim)
    t = args.clip // 2
    g = args.side // 14
    P_full, P_small = g * g, (g // 2) * (g // 2)
    S, S_small = t * P_full, t * P_small
    St = S + S_small
    pd = 3 * 2 * 14 * 14

    params = init_qwen_vit_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    if args.int8 or args.int8_weight_only:
        from flash_vstream_tpu.weights.quantize import (enable_w8a8_prefill,
                                                        quantize_params)
        params = quantize_params(params)
        if args.int8:
            enable_w8a8_prefill()
    rng = np.random.default_rng(0)
    n_bank = 4
    patches = jnp.asarray(rng.normal(size=(n_bank, St, pd)).astype(
        np.float32)).astype(jnp.bfloat16)

    rope_f = vision_rope_angles(
        jnp.asarray(grid_positions([(1, g, g)]))[:, 0],
        jnp.asarray(grid_positions([(1, g, g)]))[:, 1], hd)
    rope_s = vision_rope_angles(
        jnp.asarray(grid_positions([(1, g // 2, g // 2)]))[:, 0],
        jnp.asarray(grid_positions([(1, g // 2, g // 2)]))[:, 1], hd)

    vit_flops = cfg.num_layers * (
        4 * 2 * St * D * D + 2 * 2 * St * D * I
        + 2 * 2 * t * H * hd * (P_full ** 2 + P_small ** 2))

    def qkv_fused(lp, hf):
        wq, wk, wv = lp["attn"]["wq"], lp["attn"]["wk"], lp["attn"]["wv"]
        if hasattr(wq["w"], "q"):
            # int8: concat the quantized columns + their per-channel scales
            # — ONE activation-quantization pass feeds all three projections
            from flash_vstream_tpu.weights.quantize import QuantWeight
            w = QuantWeight(
                jnp.concatenate([wq["w"].q, wk["w"].q, wv["w"].q], axis=1),
                jnp.concatenate([wq["w"].scale, wk["w"].scale,
                                 wv["w"].scale], axis=-1))
        else:
            w = jnp.concatenate([wq["w"], wk["w"], wv["w"]], axis=1)
        b = (jnp.concatenate([wq["b"], wk["b"], wv["b"]])
             if "b" in wq else None)
        qkv = dense(hf, w, b)
        return jnp.split(qkv, 3, axis=-1)

    def attn_heads(x, T, P):
        return x.reshape(T, P, H, hd).transpose(0, 2, 1, 3)

    def make_blocks(mode):
        def attn_stream(lp, h, rope, attn_fn, fused):
            T, P, _ = h.shape
            hf = h.reshape(T * P, D)
            if fused:
                q, k, v = qkv_fused(lp, hf)
            else:
                q = dense(hf, lp["attn"]["wq"]["w"], lp["attn"]["wq"].get("b"))
                k = dense(hf, lp["attn"]["wk"]["w"], lp["attn"]["wk"].get("b"))
                v = dense(hf, lp["attn"]["wv"]["w"], lp["attn"]["wv"].get("b"))
            q, k, v = (attn_heads(x, T, P) for x in (q, k, v))
            q = apply_rope(q, *rope)
            k = apply_rope(k, *rope)
            out = attn_fn(q, k, v)
            out = out.transpose(0, 2, 1, 3).reshape(T * P, D)
            return dense(out, lp["attn"]["wo"]["w"], lp["attn"]["wo"].get("b"))

        def body(x, lp):
            h = layer_norm(x, lp["ln1"]["scale"], lp["ln1"]["bias"], 1e-6)
            if mode == "combqkv":
                q, k, v = qkv_fused(lp, h.reshape(St, D))

                def one_stream(q, k, v, T, P, rope):
                    q, k, v = (attn_heads(x, T, P) for x in (q, k, v))
                    q = apply_rope(q, *rope)
                    k = apply_rope(k, *rope)
                    out = flash_attention(q, k, v)
                    return out.transpose(0, 2, 1, 3).reshape(T * P, D)

                a_full = one_stream(q[:S], k[:S], v[:S], t, P_full, rope_f)
                a_small = one_stream(q[S:], k[S:], v[S:], t, P_small, rope_s)
                attn = jnp.concatenate([a_full, a_small])
                attn = dense(attn, lp["attn"]["wo"]["w"],
                             lp["attn"]["wo"].get("b"))
            elif mode == "onecall":
                hf = h.reshape(St, D)
                q, k, v = qkv_fused(lp, hf)
                # pad the small stream's frames to P_full tokens and run ONE
                # attention call over 2t frames
                def pad_heads(x):
                    xf = attn_heads(x[:S], t, P_full)
                    xs = attn_heads(x[S:], t, P_small)
                    xs = jnp.pad(xs, ((0, 0), (0, 0),
                                      (0, P_full - P_small), (0, 0)))
                    return jnp.concatenate([xf, xs], axis=0)
                q, k, v = pad_heads(q), pad_heads(k), pad_heads(v)
                cos = jnp.concatenate([
                    jnp.broadcast_to(rope_f[0], (P_full, hd)),
                    jnp.pad(rope_s[0], ((0, P_full - P_small), (0, 0)))])
                # rope per stream: apply separately via mask-free split
                qf, qs = q[:t], q[t:]
                kf, ks = k[:t], k[t:]
                qf = apply_rope(qf, *rope_f)
                kf = apply_rope(kf, *rope_f)
                pad_rope = (jnp.pad(rope_s[0],
                                    ((0, P_full - P_small), (0, 0))),
                            jnp.pad(rope_s[1],
                                    ((0, P_full - P_small), (0, 0))))
                qs = apply_rope(qs, *pad_rope)
                ks = apply_rope(ks, *pad_rope)
                q = jnp.concatenate([qf, qs], axis=0)
                k = jnp.concatenate([kf, ks], axis=0)
                # segment mask: padded tokens attend within their own pad
                # zone but their outputs are dropped at gather time; exact
                # because attention is frame-local either way
                out = flash_attention(q, k, v)
                of = out[:t].transpose(0, 2, 1, 3).reshape(S, D)
                os_ = out[t:, :, :P_small].transpose(0, 2, 1, 3).reshape(
                    S_small, D)
                attn = jnp.concatenate([of, os_])
                attn = dense(attn, lp["attn"]["wo"]["w"],
                             lp["attn"]["wo"].get("b"))
            elif mode == "framekernel":
                # Pallas frame-local attention: one (frame, head-block)
                # program computes qk^T/softmax/pv entirely in VMEM — the
                # [S, S] f32 scores never round-trip HBM (the XLA path's
                # extra ~34 MB/layer of score traffic)
                from jax.experimental import pallas as _pl

                def frame_attn(q, k, v):
                    Bq, Hq, Sq, Dh = q.shape
                    hb = min(args.head_block, Hq)
                    sc = 1.0 / (Dh ** 0.5)

                    def kern(q_ref, k_ref, v_ref, o_ref):
                        qq = q_ref[0]
                        kk = k_ref[0]
                        vv = v_ref[0]
                        ss = jax.lax.dot_general(
                            qq, kk, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * sc
                        mm = jnp.max(ss, axis=-1, keepdims=True)
                        pp = jnp.exp(ss - mm)
                        ll = jnp.sum(pp, axis=-1, keepdims=True)
                        pp = (pp / ll).astype(qq.dtype)
                        oo = jax.lax.dot_general(
                            pp, vv, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
                        o_ref[0] = oo.astype(o_ref.dtype)

                    spec = _pl.BlockSpec((1, hb, Sq, Dh),
                                         lambda b, h: (b, h, 0, 0))
                    return _pl.pallas_call(
                        kern,
                        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
                        grid=(Bq, Hq // hb),
                        in_specs=[spec, spec, spec],
                        out_specs=spec,
                    )(q, k, v)

                a_full = attn_stream(
                    lp, h[:S].reshape(t, P_full, D), rope_f, frame_attn,
                    False)
                a_small = attn_stream(
                    lp, h[S:].reshape(t, P_small, D), rope_s, frame_attn,
                    False)
                attn = jnp.concatenate([a_full, a_small])
            elif mode == "noattn":
                # projections run, attention itself replaced by identity on
                # v: isolates the attention cost (matmul+quant unchanged)
                a_full = attn_stream(
                    lp, h[:S].reshape(t, P_full, D), rope_f,
                    lambda q, k, v: v, False)
                a_small = attn_stream(
                    lp, h[S:].reshape(t, P_small, D), rope_s,
                    lambda q, k, v: v, False)
                attn = jnp.concatenate([a_full, a_small])
            else:
                fused = mode in ("fusedqkv", "xlaattn")
                attn_fn = xla_attention if mode == "xlaattn" else \
                    flash_attention
                a_full = attn_stream(
                    lp, h[:S].reshape(t, P_full, D), rope_f, attn_fn, fused)
                a_small = attn_stream(
                    lp, h[S:].reshape(t, P_small, D), rope_s, attn_fn, fused)
                attn = jnp.concatenate([a_full, a_small])
            x = x + attn
            h = layer_norm(x, lp["ln2"]["scale"], lp["ln2"]["bias"], 1e-6)
            x = x + gelu_mlp(lp["mlp"], h, cfg.hidden_act)
            return x, None
        return body

    def run_mode(mode):
        if args.single_layer:
            body = make_blocks(mode)

            def loop(params_, patches):
                layer0 = jax.tree.map(lambda a: a[0], params_["layers"])

                def scan_body(x, i):
                    x, _ = body(x, layer0)
                    return x, ()
                x = dense(patches[0], params_["patch_embed"]["w"])
                x, _ = jax.lax.scan(
                    scan_body, x, jnp.arange(args.iters * cfg.num_layers))
                return x[0, 0].astype(jnp.float32)
        elif mode == "base":
            def encode(p):
                return qwen_vit_blocks_frames(
                    params, cfg, p, t_full=t, hw_full=(g, g),
                    t_small=t, hw_small=(g // 2, g // 2))
        else:
            body = make_blocks(mode)

            def encode(p):
                x = dense(p, params["patch_embed"]["w"])
                x, _ = jax.lax.scan(body, x, params["layers"])
                return x

        if not args.single_layer:
            def loop(params_, patches):
                def scan_body(acc, i):
                    h = encode(patches[i % n_bank])
                    return acc + h[0, 0].astype(jnp.float32), ()
                acc, _ = jax.lax.scan(scan_body, jnp.float32(0),
                                      jnp.arange(args.iters))
                return acc

        jloop = jax.jit(loop)
        for attempt in range(args.retries):
            t0 = time.perf_counter()
            try:
                print(f"[{time.strftime('%H:%M:%S')}] {mode}: compile "
                      f"attempt {attempt + 1}", file=sys.stderr, flush=True)
                float(jloop(params, patches))
                break
            except jax.errors.JaxRuntimeError as e:
                print(f"[{time.strftime('%H:%M:%S')}] {mode}: compile died "
                      f"after {time.perf_counter() - t0:.0f}s: "
                      f"{str(e).splitlines()[0]}", file=sys.stderr, flush=True)
                if attempt == args.retries - 1:
                    raise
                time.sleep(30)
        print(f"[{time.strftime('%H:%M:%S')}] {mode}: compiled in "
              f"{time.perf_counter() - t0:.0f}s", file=sys.stderr, flush=True)
        dts = []
        for _ in range(args.trials):
            t0 = time.perf_counter()
            float(jloop(params, patches))
            dts.append(time.perf_counter() - t0)
        dt = min(dts) / args.iters
        tag8 = (" int8" if args.int8
                else (" int8-wo" if args.int8_weight_only else ""))
        print(f"{mode:10s}{tag8} {dt * 1e3:7.2f} ms/clip "
              f"{vit_flops / dt / 1e12:6.1f} TF/s", file=sys.stderr,
              flush=True)
        return dt

    results = {}
    for m in args.modes.split(","):
        results[m] = run_mode(m)
        print(json.dumps({k: round(v * 1e3, 2)
                          for k, v in results.items()}), flush=True)


if __name__ == "__main__":
    main()
