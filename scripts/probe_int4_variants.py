"""Probe: int4 decode-matvec kernel VARIANTS, to locate the bottleneck.

Variants (all read the same packed [din//2, dout] uint8 from HBM):
  v1-current   mask/convert in i32->bf16, batched partial dots + f32 scales
  v2-biasfold  like v1 but the -8 unbias folds into a per-block correction
  v3-floor     unpack + ONE plain [1,din]@[din,blk] dot, no scales/bias
               (wrong math — isolates unpack+dot cost)
  v4-int8dot   unpack in the 8-bit domain (u8 masks -> i8), int8 MXU dot
               against an int8-quantized x, scales applied to partials
  v5-u8mask    u8-domain masks then i32->bf16 converts (fewer wide masks)

Methodology per CLAUDE.md: chained scan in one jit, host-fetch fencing,
best-of-N on the shared chip.
"""
import argparse
import functools
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flash_vstream_tpu.core.runtime_setup import enable_compilation_cache


# ---------------- kernel bodies ----------------

def k_v1(x_ref, w4_ref, s_ref, o_ref, *, nb):
    b = w4_ref[...].astype(jnp.int32)
    n_lo = (b & 15).astype(jnp.bfloat16) - 8.0
    n_hi = (b >> 4).astype(jnp.bfloat16) - 8.0
    dh, blk = b.shape
    nbh = nb // 2
    bs = dh // nbh
    s = s_ref[...]
    s_lo = jax.lax.slice_in_dim(s, 0, nbh, axis=0).reshape(nbh, 1, blk)
    s_hi = jax.lax.slice_in_dim(s, nbh, nb, axis=0).reshape(nbh, 1, blk)
    x = x_ref[...]
    x_lo = jax.lax.slice_in_dim(x, 0, dh, axis=1).reshape(nbh, 1, bs)
    x_hi = jax.lax.slice_in_dim(x, dh, 2 * dh, axis=1).reshape(nbh, 1, bs)

    def part(xh, n):
        n3 = n.reshape(nbh, bs, blk)
        return jax.lax.dot_general(xh, n3, (((2,), (1,)), ((0,), (0,))),
                                   preferred_element_type=jnp.float32)

    p = part(x_lo, n_lo) * s_lo + part(x_hi, n_hi) * s_hi
    o_ref[...] = jnp.sum(p, axis=0).astype(o_ref.dtype)


def k_v2(x_ref, w4_ref, s_ref, o_ref, *, nb):
    b = w4_ref[...].astype(jnp.int32)
    n_lo = (b & 15).astype(jnp.bfloat16)      # biased [1,15], no unbias
    n_hi = (b >> 4).astype(jnp.bfloat16)
    dh, blk = b.shape
    nbh = nb // 2
    bs = dh // nbh
    s = s_ref[...]
    s_lo = jax.lax.slice_in_dim(s, 0, nbh, axis=0).reshape(nbh, 1, blk)
    s_hi = jax.lax.slice_in_dim(s, nbh, nb, axis=0).reshape(nbh, 1, blk)
    x = x_ref[...]
    x_lo = jax.lax.slice_in_dim(x, 0, dh, axis=1).reshape(nbh, 1, bs)
    x_hi = jax.lax.slice_in_dim(x, dh, 2 * dh, axis=1).reshape(nbh, 1, bs)
    c_lo = 8.0 * jnp.sum(x_lo.astype(jnp.float32), axis=2, keepdims=True)
    c_hi = 8.0 * jnp.sum(x_hi.astype(jnp.float32), axis=2, keepdims=True)

    def part(xh, n):
        n3 = n.reshape(nbh, bs, blk)
        return jax.lax.dot_general(xh, n3, (((2,), (1,)), ((0,), (0,))),
                                   preferred_element_type=jnp.float32)

    p = (part(x_lo, n_lo) - c_lo) * s_lo + (part(x_hi, n_hi) - c_hi) * s_hi
    o_ref[...] = jnp.sum(p, axis=0).astype(o_ref.dtype)


def k_v3(x_ref, w4_ref, s_ref, o_ref, *, nb):
    del s_ref
    b = w4_ref[...].astype(jnp.int32)
    n_lo = (b & 15).astype(jnp.bfloat16)
    n_hi = (b >> 4).astype(jnp.bfloat16)
    dh, blk = b.shape
    x = x_ref[...]
    x_lo = jax.lax.slice_in_dim(x, 0, dh, axis=1)
    x_hi = jax.lax.slice_in_dim(x, dh, 2 * dh, axis=1)
    acc = (jnp.dot(x_lo, n_lo, preferred_element_type=jnp.float32)
           + jnp.dot(x_hi, n_hi, preferred_element_type=jnp.float32))
    o_ref[...] = acc.astype(o_ref.dtype)


def k_v4(xq_ref, xs_ref, w4_ref, s_ref, o_ref, *, nb):
    b = w4_ref[...]                            # u8
    n_lo = (b & 15).astype(jnp.int8)           # same-width mask: no repack
    # u8/i8 shifts crash Mosaic on this backend: hi routes through i32
    n_hi = (b.astype(jnp.int32) >> 4).astype(jnp.int8)
    dh, blk = b.shape
    nbh = nb // 2
    bs = dh // nbh
    s = s_ref[...]
    s_lo = jax.lax.slice_in_dim(s, 0, nbh, axis=0).reshape(nbh, 1, blk)
    s_hi = jax.lax.slice_in_dim(s, nbh, nb, axis=0).reshape(nbh, 1, blk)
    xq = xq_ref[...]                           # [1, din] int8 (biased x too?)
    x_lo = jax.lax.slice_in_dim(xq, 0, dh, axis=1).reshape(nbh, 1, bs)
    x_hi = jax.lax.slice_in_dim(xq, dh, 2 * dh, axis=1).reshape(nbh, 1, bs)
    c_lo = 8 * jnp.sum(x_lo.astype(jnp.int32), axis=2, keepdims=True)
    c_hi = 8 * jnp.sum(x_hi.astype(jnp.int32), axis=2, keepdims=True)

    def part(xh, n):                           # int8 x int8 -> int32
        n3 = n.reshape(nbh, bs, blk)
        return jax.lax.dot_general(xh, n3, (((2,), (1,)), ((0,), (0,))),
                                   preferred_element_type=jnp.int32)

    p = ((part(x_lo, n_lo) - c_lo).astype(jnp.float32) * s_lo
         + (part(x_hi, n_hi) - c_hi).astype(jnp.float32) * s_hi)
    o_ref[...] = (jnp.sum(p, axis=0) * xs_ref[0, 0]).astype(o_ref.dtype)


def k_v5(x_ref, w4_ref, s_ref, o_ref, *, nb):
    b = w4_ref[...]
    lo8 = (b & 15).astype(jnp.int8)            # mask at 8-bit width
    n_lo = lo8.astype(jnp.bfloat16)
    n_hi = (b.astype(jnp.int32) >> 4).astype(jnp.bfloat16)
    dh, blk = b.shape
    nbh = nb // 2
    bs = dh // nbh
    s = s_ref[...]
    s_lo = jax.lax.slice_in_dim(s, 0, nbh, axis=0).reshape(nbh, 1, blk)
    s_hi = jax.lax.slice_in_dim(s, nbh, nb, axis=0).reshape(nbh, 1, blk)
    x = x_ref[...]
    x_lo = jax.lax.slice_in_dim(x, 0, dh, axis=1).reshape(nbh, 1, bs)
    x_hi = jax.lax.slice_in_dim(x, dh, 2 * dh, axis=1).reshape(nbh, 1, bs)
    c_lo = 8.0 * jnp.sum(x_lo.astype(jnp.float32), axis=2, keepdims=True)
    c_hi = 8.0 * jnp.sum(x_hi.astype(jnp.float32), axis=2, keepdims=True)

    def part(xh, n):
        n3 = n.reshape(nbh, bs, blk)
        return jax.lax.dot_general(xh, n3, (((2,), (1,)), ((0,), (0,))),
                                   preferred_element_type=jnp.float32)

    p = (part(x_lo, n_lo) - c_lo) * s_lo + (part(x_hi, n_hi) - c_hi) * s_hi
    o_ref[...] = jnp.sum(p, axis=0).astype(o_ref.dtype)


def make_call(kernel, din, dout, nb, blk, int8_x=False):
    dh = din // 2
    grid = (dout // blk,)
    x_specs = ([pl.BlockSpec((1, din), lambda o: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda o: (0, 0),
                             memory_space=pltpu.SMEM)]
               if int8_x else
               [pl.BlockSpec((1, din), lambda o: (0, 0),
                             memory_space=pltpu.VMEM)])

    def call(*args):
        return pl.pallas_call(
            functools.partial(kernel, nb=nb),
            grid=grid,
            in_specs=x_specs + [
                pl.BlockSpec((dh, blk), lambda o: (0, o),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nb, blk), lambda o: (0, o),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, blk), lambda o: (0, o),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, dout), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(*args)
    return call


def bench(name, matvec, din, dout, nb, iters, trials, layers=16,
          int8_x=False):
    keys = jax.random.split(jax.random.PRNGKey(0), layers)

    def mk(k):
        q = jax.random.randint(k, (din // 2, dout), 0, 255, jnp.int32
                               ).astype(jnp.uint8)
        s = jnp.full((nb, dout), 1e-3, jnp.float32)
        return (q, s)

    w = jax.tree.map(lambda *xs: jnp.stack(xs), *[mk(k) for k in keys])
    x0 = jnp.ones((1, din), jnp.bfloat16)

    @jax.jit
    def run(x, w):
        def pass_once(x, _):
            def step(x, wl):
                if int8_x:
                    xs = jnp.max(jnp.abs(x)) / 127.0
                    xq = jnp.clip(jnp.round(x / xs), -127, 127
                                  ).astype(jnp.int8)
                    y = matvec(xq, xs.reshape(1, 1), wl[0], wl[1])
                else:
                    y = matvec(x, wl[0], wl[1])
                xn = (x + y[:, :din] * 1e-6).astype(jnp.bfloat16)
                return xn, ()
            x, _ = jax.lax.scan(step, x, w)
            return x, ()
        out, _ = jax.lax.scan(pass_once, x, None, length=iters)
        return jnp.sum(out)

    try:
        float(run(x0, w))
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"{name:14s} FAILED: {msg}")
        return None
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        float(run(x0, w))
        best = min(best, time.perf_counter() - t0)
    stored = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                 for a in jax.tree.leaves(w))
    ms = best / (iters * layers) * 1e3
    gbs = stored * iters / best / 1e9
    print(f"{name:14s} {ms:7.3f} ms/matvec   {gbs:7.1f} GB/s stored-weight")
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=4)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--din", type=int, default=3584)
    ap.add_argument("--dout", type=int, default=18944)
    ap.add_argument("--blk", type=int, default=512)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()
    enable_compilation_cache()
    din, dout, blk = args.din, args.dout, args.blk
    nb = din // 128
    print(f"[1,{din}] @ packed[{din // 2},{dout}] blk={blk} "
          f"on {jax.devices()[0]}")
    variants = {
        "v1-current": (k_v1, False),
        "v2-biasfold": (k_v2, False),
        "v3-floor": (k_v3, False),
        "v4-int8dot": (k_v4, True),
        "v5-u8mask": (k_v5, False),
    }
    for name, (kern, int8_x) in variants.items():
        if args.only and args.only not in name:
            continue
        call = make_call(kern, din, dout, nb, blk, int8_x=int8_x)
        bench(name, call, din, dout, nb, args.iters, args.trials,
              int8_x=int8_x)


if __name__ == "__main__":
    main()


# ---------------- piece isolation (appended after first measurements) ----


def k_v6_bf16dot(x_ref, w_ref, o_ref, *, nb):
    del nb
    o_ref[...] = jnp.dot(x_ref[...], w_ref[...],
                         preferred_element_type=jnp.float32
                         ).astype(o_ref.dtype)


def k_v7_unpackonly(x_ref, w4_ref, s_ref, o_ref, *, nb):
    del s_ref
    b = w4_ref[...].astype(jnp.int32)
    n_lo = (b & 15).astype(jnp.bfloat16)
    n_hi = (b >> 4).astype(jnp.bfloat16)
    acc = jnp.sum(n_lo + n_hi, axis=0, keepdims=True)   # [1, blk] reduce
    o_ref[...] = (acc * x_ref[0, 0]).astype(o_ref.dtype)


def bench_bf16(name, din, dout, blk, iters, trials, layers=16):
    keys = jax.random.split(jax.random.PRNGKey(0), layers)
    w = jnp.stack([jax.random.normal(k, (din, dout), jnp.bfloat16)
                   for k in keys])
    x0 = jnp.ones((1, din), jnp.bfloat16)
    grid = (dout // blk,)

    def call(x, wl):
        return pl.pallas_call(
            functools.partial(k_v6_bf16dot, nb=0),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, din), lambda o: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((din, blk), lambda o: (0, o),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, blk), lambda o: (0, o),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, dout), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(x, wl)

    @jax.jit
    def run(x, w):
        def pass_once(x, _):
            def step(x, wl):
                y = call(x, wl)
                return (x + y[:, :din] * 1e-6).astype(jnp.bfloat16), ()
            x, _ = jax.lax.scan(step, x, w)
            return x, ()
        out, _ = jax.lax.scan(pass_once, x, None, length=iters)
        return jnp.sum(out)

    float(run(x0, w))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        float(run(x0, w))
        best = min(best, time.perf_counter() - t0)
    stored = w.size * 2
    ms = best / (iters * layers) * 1e3
    print(f"{name:14s} {ms:7.3f} ms/matvec   "
          f"{stored * iters / best / 1e9:7.1f} GB/s stored-weight")


def main2():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=4)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--din", type=int, default=3584)
    ap.add_argument("--dout", type=int, default=18944)
    ap.add_argument("--blk", type=int, default=512)
    ap.add_argument("--which", type=str, default="v6")
    args = ap.parse_args()
    enable_compilation_cache()
    din, dout, blk = args.din, args.dout, args.blk
    nb = din // 128
    print(f"[1,{din}] @ [{din},{dout}] blk={blk} on {jax.devices()[0]}")
    if "v6" in args.which:
        bench_bf16("v6-bf16dot", din, dout, blk, args.iters, args.trials)
    if "v7" in args.which:
        call = make_call(k_v7_unpackonly, din, dout, nb, blk)
        bench("v7-unpackonly", call, din, dout, nb, args.iters, args.trials)


if __name__ == "__main__" and "--which" in sys.argv:
    main2()
elif __name__ == "__main__" and not sys.modules.get("_probe_ran"):
    pass  # main() already ran above
