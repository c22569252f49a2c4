"""Block-size probe for the T5 encoder flash-bias attention kernel.

The encoder's attention is the largest remaining bf16 term of the int8
inference batch (~4.6 ms/layer x 24 at the 2049-token QVH shape,
docs/performance.md). This times flash_attention_bias CHAINED inside one
jit (24x, like the layer stack — single-shot timings carry ~3.5 ms of
axon dispatch latency) across (block_q, block_k) candidates, plus the
XLA materialized-bias reference.

Usage: python scripts/probe_flash_bias.py [N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mr_blip_tpu.ops.flash_attention import _flash_attention_bias

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2049
    b, h, d = 4, 32, 64
    layers = 24
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((1, h, n, n)), jnp.bfloat16)
    kv_mask = jnp.ones((b, n), jnp.int8)

    def chain(bq, bk, bh=1):
        @jax.jit
        def f(q, k, v, bias, kv_mask):
            x = q
            for _ in range(layers):
                x = _flash_attention_bias(x, k, v, bias, kv_mask, bq, bk,
                                          False, bh)
            return x
        return f

    def xla_ref():
        @jax.jit
        def f(q, k, v, bias, kv_mask):
            x = q
            for _ in range(layers):
                logits = jnp.einsum(
                    "bnhd,bmhd->bhnm", x * (d ** -0.5), k,
                    preferred_element_type=jnp.float32,
                ) + bias.astype(jnp.float32)
                logits = jnp.where(kv_mask[:, None, None, :] != 0, logits,
                                   -jnp.inf)
                p = jax.nn.softmax(logits, axis=-1)
                x = jnp.einsum("bhnm,bmhd->bnhd", p.astype(v.dtype), v)
            return x
        return f

    def bench(f):
        out = f(q, k, v, bias, kv_mask)
        float(jnp.sum(out.astype(jnp.float32)))  # fence
        t0 = time.time()
        iters = 3
        for _ in range(iters):
            out = f(q, k, v, bias, kv_mask)
        float(jnp.sum(out.astype(jnp.float32)))
        return (time.time() - t0) / iters / layers

    print(f"shape: B={b} H={h} N={n} D={d}, {layers}x chained", flush=True)
    # numeric check of the head-blocked kernel vs the single-head kernel
    one = _flash_attention_bias(q, k, v, bias, kv_mask, 256, 512, False, 1)
    for bh in (2, 4):
        try:
            mh = _flash_attention_bias(q, k, v, bias, kv_mask, 256, 512,
                                       False, bh)
            err = float(jnp.max(jnp.abs(mh.astype(jnp.float32)
                                        - one.astype(jnp.float32))))
            print(f"block_h={bh} max|delta| vs block_h=1: {err:.2e}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"block_h={bh} check FAILED {type(e).__name__}", flush=True)

    for bq, bk, bh in [(512, 512, 1), (256, 1024, 1), (256, 512, 2),
                       (256, 1024, 2), (256, 512, 4), (128, 512, 4),
                       (128, 512, 8), (128, 1024, 8)]:
        try:
            t = bench(chain(bq, bk, bh))
            print(f"flash bq={bq:5d} bk={bk:5d} bh={bh}: {t*1e3:7.3f} "
                  "ms/layer", flush=True)
        except Exception as e:  # noqa: BLE001 — probe tool
            print(f"flash bq={bq:5d} bk={bk:5d} bh={bh}: FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)
    try:
        t = bench(xla_ref())
        print(f"XLA materialized-bias : {t*1e3:7.3f} ms/layer", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"XLA materialized-bias : FAILED {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
