"""Host->device transfer + dispatch overhead probe through the axon tunnel.

Separates the live-session ingest overhead into (a) pure host->device
transfer of clip pixels, (b) dispatch+execute of a trivial jit on
device-resident args, (c) ingest-shaped dispatch with host args. On real
TPU hosts (PCIe/DMA) (a) is negligible; through a remote tunnel it can
dominate, which caps session fps regardless of device compute.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    out = {}

    @jax.jit
    def touch(x):
        return x.ravel()[0].astype(jnp.float32) + 1

    for mb, shape in [(1.2, (8, 224, 224, 3)), (2.4, (16, 224, 224, 3)),
                      (4.8, (32, 224, 224, 3)), (19.3, (128, 224, 224, 3))]:
        xs = [rng.integers(0, 255, shape, dtype=np.uint8) for _ in range(4)]
        # warmup
        float(touch(jax.device_put(xs[0], dev)))
        t0 = time.perf_counter()
        n = 6
        for i in range(n):
            a = jax.device_put(xs[i % 4], dev)
            f = touch(a)
        float(f)
        dt = (time.perf_counter() - t0) / n
        bw = np.prod(shape) / dt / 1e6
        print(f"transfer {mb:5.1f} MB: {dt*1e3:7.1f} ms  {bw:6.1f} MB/s",
              file=sys.stderr)
        out[f"{mb}MB_ms"] = round(dt * 1e3, 1)

    # dispatch-only: device-resident arg, trivial compute, fetch each time
    a = jax.device_put(xs[0], dev)
    float(touch(a))
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        f = touch(a)
        float(f)
    dt = (time.perf_counter() - t0) / n
    print(f"dispatch+fetch roundtrip: {dt*1e3:.1f} ms", file=sys.stderr)
    out["dispatch_fetch_ms"] = round(dt * 1e3, 1)

    # async dispatch depth: 20 dispatches then one fetch
    t0 = time.perf_counter()
    for _ in range(n):
        f = touch(a)
    float(f)
    dt = (time.perf_counter() - t0) / n
    print(f"async dispatch amortized: {dt*1e3:.1f} ms", file=sys.stderr)
    out["async_dispatch_ms"] = round(dt * 1e3, 1)

    print(json.dumps({"metric": "tunnel_probe", **out}))


if __name__ == "__main__":
    main()
