"""Value-check every Pallas kernel ON REAL TPU HARDWARE vs XLA references.

CI runs on CPU where the Pallas wrappers dispatch to jnp references (or the
interpreter, which implements different boundary semantics than Mosaic) —
so a hardware-only miscompile or contract violation is invisible to the
test suite. This script exists because exactly that happened: in-kernel
``pl.ds`` slices do NOT clamp at the array edge on hardware (they read
tile-padding garbage), which silently corrupted every flash kernel at
non-block-divisible lengths (T5's 2049 tokens) with nondeterministic
NaNs while all 350+ CPU tests stayed green.

Run as part of /verify whenever kernel code changes:

    python scripts/check_kernels_tpu.py          # all checks, ~5 min
    python scripts/check_kernels_tpu.py flash    # substring filter

Exit code 0 iff every check passes.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FAILED = []


def check(name, got, want, tol):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    nan = int(np.isnan(got).sum())
    err = float(np.max(np.abs(got - want))) if nan == 0 else float("nan")
    ok = nan == 0 and err <= tol
    print(f"{'PASS' if ok else 'FAIL'}  {name}: max|delta|={err:.3e} "
          f"nan={nan} (tol {tol})", flush=True)
    if not ok:
        FAILED.append(name)


def main():
    import jax
    import jax.numpy as jnp

    filt = sys.argv[1] if len(sys.argv) > 1 else ""
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", flush=True)

    def softmax_ref(q, k, v, bias=None, kv_mask=None, causal=False):
        d = q.shape[-1]
        logits = jnp.einsum("bnhd,bmhd->bhnm", q.astype(jnp.float32) * d**-0.5,
                            k.astype(jnp.float32))
        if bias is not None:
            logits += bias.astype(jnp.float32)
        if kv_mask is not None:
            logits = jnp.where(kv_mask[:, None, None, :] != 0, logits, -jnp.inf)
        if causal:
            n, m = logits.shape[-2:]
            cm = jnp.tril(jnp.ones((n, m), bool))
            logits = jnp.where(cm[None, None], logits, -jnp.inf)
        p = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bhnm,bmhd->bnhd", p, v.astype(jnp.float32))

    # ---------------------------------------------------- flash (plain)
    if filt in "flash_plain":
        from mr_blip_tpu.ops.flash_attention import flash_attention

        for n, causal in [(1025, False), (2049, False), (1025, True)]:
            b, h, d = 2, 8, 64
            q = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.bfloat16)
            k = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.bfloat16)
            v = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.bfloat16)
            got = flash_attention(q, k, v, causal=causal)
            want = softmax_ref(q, k, v, causal=causal)
            check(f"flash_attention n={n} causal={causal}", got, want, 0.02)

    # ----------------------------------------------------- flash (bias)
    if filt in "flash_bias" or not filt:
        from mr_blip_tpu.ops.flash_attention import _flash_attention_bias

        b, h, n, d = 4, 32, 2049, 64  # T5-XL encoder @ 60f QVH shape
        q = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.bfloat16)
        bias = jnp.asarray(rng.standard_normal((1, h, n, n)), jnp.bfloat16)
        kvm = jnp.ones((b, n), jnp.int8)
        kvm = kvm.at[:, -7:].set(0)  # ragged padding mask
        want = softmax_ref(q, k, v, bias, kvm)
        # padded keys get -inf logits; their output rows equal ref anyway
        for bh in (1, 2):
            got = _flash_attention_bias(q, k, v, bias, kvm, 512, 512, False,
                                        bh)
            check(f"flash_bias fwd block_h={bh} n={n}", got, want, 0.02)

        # The (2040, 2048) loader-bucket shape: with the old VMEM
        # accounting this was a compile-time scoped-vmem OOM at block_h=2
        # (16.07M vs the 16M limit) — found by the round-4 loader bench,
        # invisible to every CPU test AND to the 2049 shape above (whose
        # padded m=2176 happened to trigger the shrink).
        n2, m2 = 2040, 2048
        q2 = jnp.asarray(rng.standard_normal((b, n2, h, d)), jnp.bfloat16)
        k2 = jnp.asarray(rng.standard_normal((b, m2, h, d)), jnp.bfloat16)
        v2 = jnp.asarray(rng.standard_normal((b, m2, h, d)), jnp.bfloat16)
        bias2 = jnp.asarray(rng.standard_normal((1, h, n2, m2)), jnp.bfloat16)
        kvm2 = jnp.ones((b, m2), jnp.int8)
        want2 = softmax_ref(q2, k2, v2, bias2, kvm2)
        for bh in (1, 2):
            got2 = _flash_attention_bias(q2, k2, v2, bias2, kvm2, 512, 512,
                                         False, bh)
            check(f"flash_bias fwd block_h={bh} n={n2} m={m2}", got2, want2,
                  0.02)
        del q2, k2, v2, bias2, want2, got2

        # gradient path (stats + dq + dkv kernels) at a smaller
        # non-divisible shape so the XLA reference fits
        b, h, n, d = 2, 4, 517, 64
        q = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
        bias = jnp.asarray(rng.standard_normal((1, h, n, n)), jnp.float32)
        kvm = jnp.ones((b, n), jnp.int8)

        def loss_flash(q, k, v, bias):
            return jnp.sum(_flash_attention_bias(
                q, k, v, bias, kvm, 256, 256, True, 1
            ) ** 2)

        def loss_ref(q, k, v, bias):
            return jnp.sum(softmax_ref(q, k, v, bias, kvm) ** 2)

        gf = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
        for nm, a, bb in zip(("dq", "dk", "dv", "dbias"), gf, gr):
            check(f"flash_bias bwd {nm} n={n}", a, bb,
                  0.05 * float(jnp.max(jnp.abs(bb)) + 1))

    # ------------------------------------------------------- qkv packed
    if filt in "qkv_packed" or not filt:
        from mr_blip_tpu.ops.flash_attention import flash_attention_qkv_packed

        bt, n, heads, d = 48, 257, 16, 88  # EVA ViT-g frame batch slice
        qkv = jnp.asarray(rng.standard_normal((bt, n, 3 * heads * d)),
                          jnp.bfloat16)
        hd = heads * d
        got = flash_attention_qkv_packed(qkv, heads)
        want = softmax_ref(
            qkv[..., :hd].reshape(bt, n, heads, d),
            qkv[..., hd:2 * hd].reshape(bt, n, heads, d),
            qkv[..., 2 * hd:].reshape(bt, n, heads, d),
        ).reshape(bt, n, hd)
        check("flash_attention_qkv_packed ViT-g shape", got, want, 0.02)

        # sublane-padded tokens (the int8 ViT's free-bitcast layout):
        # pad rows carry large garbage; n_valid must mask them as keys
        # so the real-token outputs match the unpadded run exactly
        np_pad = 264
        qkv_p = jnp.concatenate([
            qkv,
            jnp.asarray(
                rng.standard_normal((bt, np_pad - n, 3 * hd)) * 7.0,
                jnp.bfloat16,
            ),
        ], axis=1)
        got_p = flash_attention_qkv_packed(qkv_p, heads, n_valid=n)
        check("flash_attention_qkv_packed padded N=264 n_valid=257",
              got_p[:, :n], want, 0.02)

    # ------------------------------------------- fused int8 attention block
    if filt in "attn_block" or not filt:
        from mr_blip_tpu.ops.int8_matmul import (
            _attn_block_ref,
            w8a8_attn_block,
        )

        bt, np_pad, nv, c, heads = 6, 264, 257, 1408, 16
        x = jnp.asarray(rng.standard_normal((bt, np_pad, c)) * 0.5,
                        jnp.bfloat16)

        def mk_w(kk, nn_):
            w = rng.standard_normal((kk, nn_)) * 0.02
            s = np.abs(w).max(axis=0) / 127.0
            q = np.clip(np.round(w / s), -127, 127).astype(np.int8)
            return jnp.asarray(q), jnp.asarray(s, jnp.float32)

        wqkv, sqkv = mk_w(c, 3 * c)
        wp, sp = mk_w(c, c)
        qb = jnp.asarray(rng.standard_normal(3 * c) * 0.05, jnp.float32)
        pb = jnp.asarray(rng.standard_normal(c) * 0.05, jnp.float32)
        ls = jnp.asarray(rng.standard_normal(c) * 0.05 + 1.0, jnp.float32)
        lb = jnp.asarray(rng.standard_normal(c) * 0.05, jnp.float32)
        got = w8a8_attn_block(
            x, wqkv, sqkv, qb, wp, sp, pb, norm=("ln", ls, lb, 1e-6),
            num_heads=heads, n_valid=nv,
        )
        want = _attn_block_ref(
            x, wqkv, sqkv, qb.reshape(1, -1), wp, sp, pb.reshape(1, -1),
            ls.reshape(1, c), lb.reshape(1, c), 1e-6, heads, nv,
        )
        check("w8a8_attn_block EVA-g shape padded n_valid", got, want, 0.05)

    # ----------------------------------------------------------- relpos
    if filt in "relpos" or not filt:
        from mr_blip_tpu.ops.flash_attention import flash_attention_relpos
        from mr_blip_tpu.models.t5 import relative_position_bucket

        b, h, n, d = 2, 8, 1037, 64
        nb, maxd = 32, 128
        q = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.bfloat16)
        table = jnp.asarray(rng.standard_normal((h, nb)), jnp.float32)
        kvm = jnp.ones((b, n), jnp.int32)
        got = flash_attention_relpos(q, k, v, table,
                                     kv_mask=kvm, num_buckets=nb,
                                     max_distance=maxd)
        # XLA reference: materialize the bucketed bias
        pos = jnp.arange(n)
        rel = pos[None, :] - pos[:, None]
        bucket = relative_position_bucket(rel, bidirectional=True,
                                          num_buckets=nb, max_distance=maxd)
        bias = table.T[bucket].transpose(2, 0, 1)[None]
        # both the kernel and softmax_ref scale q by d^-0.5 internally
        want = softmax_ref(q, k, v, bias)
        check(f"relpos_attention fwd n={n}", got, want, 0.03)

    # ------------------------------------------------------ int8 ragged
    if filt in "int8" or not filt:
        from mr_blip_tpu.ops.int8_matmul import (
            _w8a8_linear_ref, _w8a8_mlp_ref, _w8a8_mlp_gated_ref,
            w8a8_linear, w8a8_mlp, w8a8_mlp_gated,
        )

        def qw(kk, nn):
            w = rng.standard_normal((kk, nn)).astype(np.float32) * 0.05
            s = np.maximum(np.abs(w).max(0), 1e-8) / 127.0
            qq = np.clip(np.round(w / s), -127, 127).astype(np.int8)
            return jnp.asarray(qq), jnp.asarray(s)

        m, kk = 61680 - 3, 1408  # ragged ViT token count
        x = jnp.asarray(rng.standard_normal((m, kk)) * 0.3, jnp.bfloat16)
        r = jnp.asarray(rng.standard_normal((m, kk)) * 0.3, jnp.bfloat16)
        wq, sw = qw(kk, kk)
        got = w8a8_linear(x, wq, sw, None, residual=r)
        want = (_w8a8_linear_ref(x, wq, sw, None).astype(jnp.float32)
                + r.astype(jnp.float32))
        check("w8a8_linear ragged M + residual", got, want, 0.35)

        w1q, s1 = qw(kk, 6144)
        w2q, s2 = qw(6144, kk)
        b1 = jnp.asarray(rng.standard_normal((6144,)) * 0.01, jnp.float32)
        b2 = jnp.asarray(rng.standard_normal((kk,)) * 0.01, jnp.float32)
        got = w8a8_mlp(x, w1q, s1, b1, w2q, s2, b2, residual=r)
        want = (_w8a8_mlp_ref(x, w1q, s1, b1, w2q, s2, b2,
                              block_h=1536).astype(jnp.float32)
                + r.astype(jnp.float32))
        check("w8a8_mlp ragged M + residual", got, want, 0.4)

        m2, d2, ff = 8196 - 5, 2048, 5120
        x2 = jnp.asarray(rng.standard_normal((m2, d2)) * 0.3, jnp.bfloat16)
        w0q, s0 = qw(d2, ff)
        w1q, s1 = qw(d2, ff)
        woq, so = qw(ff, d2)
        got = w8a8_mlp_gated(x2, w0q, s0, w1q, s1, woq, so)
        want = _w8a8_mlp_gated_ref(x2, w0q, s0, w1q, s1, woq, so,
                                   block_h=640)
        check("w8a8_mlp_gated ragged M", got, want, 0.4)

    print(("ALL KERNEL CHECKS PASS" if not FAILED
           else f"FAILURES: {FAILED}"), flush=True)
    return 1 if FAILED else 0


if __name__ == "__main__":
    sys.exit(main())
