"""Layout A/B probes for the overhead-dominated SMOW_Net stages.

The round-2 stage breakdown (tools/profile_breakdown.py) shows ~14 ms of the
25 ms forward is spent in stages running at <6% MFU: cross-attn 3.66, token
encoder 2.13, 1x1 reduce 1.96, flow conv 1.84, OFW down convs 1.64, T-lifts
1.48, trilinear lift 1.34, head 1.36. Each probe below times the current
form against a lane-width-conscious rewrite (same math, checked to 1e-2 in
bf16 / exact in f32 where applicable) with the in-graph loop methodology.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

BS = 16
bf = jnp.bfloat16
ITERS = 20


def timeit(label, fn, *args):
    def loop(*xs):
        def body(_, carry):
            out = fn(xs[0] + carry.astype(xs[0].dtype), *xs[1:])
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.mean(l.astype(jnp.float32)) for l in leaves)
            return (s * 1e-9).astype(jnp.float32)
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    c = jax.jit(loop).lower(*args).compile()
    float(c(*args))
    t0 = time.perf_counter()
    float(c(*args))
    dt = time.perf_counter() - t0
    print(f"{label:44s} {dt/ITERS*1e3:8.3f} ms", flush=True)


def check(label, a, b, tol):
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    print(f"  parity {label}: {err:.2e} {'OK' if err <= tol else 'FAIL'}",
          flush=True)


r = jax.random.normal
k = jax.random.PRNGKey

# ---------------- A. cross-attention (dim_head=1) ----------------
# current: (B, N, h, M) layout -> M=8 lanes; variant: (B, h, M, N) -> N lanes

N = 128 * 128
HEADS = 8
M = 8


def xattn_cur(q, kk, v, scale):
    kT = kk.transpose(0, 2, 1)[:, None]          # (B, 1, h, M)
    vT = v.transpose(0, 2, 1)[:, None]
    dots = q[:, :, :, None] * kT * scale         # (B, N, h, M)
    attn = jax.nn.softmax(dots, axis=-1)
    return jnp.sum(attn * vT, axis=-1)           # (B, N, h)


def xattn_new(q, kk, v, scale):
    qT = q.transpose(0, 2, 1)                    # (B, h, N)
    dots = qT[:, :, None, :] * (kk.transpose(0, 2, 1) * scale)[:, :, :, None]
    attn = jax.nn.softmax(dots, axis=2)          # (B, h, M, N), softmax on M
    out = jnp.sum(attn * v.transpose(0, 2, 1)[:, :, :, None], axis=2)  # (B,h,N)
    return out.transpose(0, 2, 1)


def probe_xattn():
    q = r(k(0), (BS, N, HEADS), bf)
    kk = r(k(1), (BS, M, HEADS), bf)
    v = r(k(2), (BS, M, HEADS), bf)
    scale = 128 ** -0.5
    check("xattn", xattn_cur(q, kk, v, scale), xattn_new(q, kk, v, scale), 2e-2)
    timeit("xattn cur (B,N,h,M)", xattn_cur, q, kk, v, scale)
    timeit("xattn new (B,h,M,N)", xattn_new, q, kk, v, scale)


# ---------------- B. token encoder softmax/einsum ----------------

T4, HW, L, C32 = 4, 128 * 128, 8, 32


def tok_cur(att, feats):
    a = jax.nn.softmax(att, axis=2)              # (B, T, HW, L) softmax on HW
    return jnp.einsum("btnl,btnc->btlc", a, feats)


def tok_new(att, feats):
    aT = att.transpose(0, 1, 3, 2)               # (B, T, L, HW)
    aT = jax.nn.softmax(aT, axis=-1)             # softmax over lanes
    return jnp.einsum("btln,btnc->btlc", aT, feats)


def probe_token():
    att = r(k(3), (BS, T4, HW, L), bf)
    feats = r(k(4), (BS, T4, HW, C32), bf)
    check("token", tok_cur(att, feats), tok_new(att, feats), 5e-2)
    timeit("token cur softmax(HW in sublanes)", tok_cur, att, feats)
    timeit("token new softmax(HW in lanes)", tok_new, att, feats)


# ---------------- C. 1x1 reduce conv + BN + relu ----------------


def probe_reduce():
    from smow_net_tpu.ops.convops import conv

    x = r(k(5), (BS, 2, 128, 128, 64), bf)
    w = r(k(6), (1, 1, 1, 64, 32), bf)
    scale = r(k(7), (32,), bf)
    shift = r(k(8), (32,), bf)

    def cur(x, w, scale, shift):
        y = conv(x, w)
        return jax.nn.relu(y * scale + shift)

    def as_matmul(x, w, scale, shift):
        y = jnp.matmul(x, w[0, 0, 0] * scale[None, :]) + shift
        return jax.nn.relu(y)

    check("reduce", cur(x, w, scale, shift), as_matmul(x, w, scale, shift), 1e-1)
    timeit("reduce conv1x1+affine+relu (conv)", cur, x, w, scale, shift)
    timeit("reduce as matmul, BN folded", as_matmul, x, w, scale, shift)


# ---------------- D. classifier head ----------------


def probe_head():
    from smow_net_tpu.ops.pixel_shuffle import smow_shuffle

    x = r(k(9), (BS, 128, 128, 128), bf)
    w = r(k(10), (128, 4), bf)

    def cur(x, w):
        y = jnp.einsum("bhwc,cd->bhwd", x, w)
        return jax.nn.sigmoid(smow_shuffle(y, 2))

    def sig_early(x, w):
        y = jax.nn.sigmoid(jnp.einsum("bhwc,cd->bhwd", x, w))
        return smow_shuffle(y, 2)

    check("head", cur(x, w), sig_early(x, w), 1e-2)
    timeit("head conv->shuffle->sigmoid", cur, x, w)
    timeit("head conv->sigmoid->shuffle", sig_early, x, w)


# ---------------- E. T-lift 2->4 ----------------


def probe_tlift():
    from smow_net_tpu.ops.resize import resize_linear

    x = r(k(11), (BS, 2, 64, 64, 32), bf)

    def cur(x):
        return resize_linear(x, (4,), (1,), align_corners=True)

    def lerp(x):
        f0 = x[:, 0:1]
        f1 = x[:, 1:2]
        c = 1.0 / 3.0
        m1 = (f0 * (1 - c) + f1 * c).astype(x.dtype)
        m2 = (f0 * c + f1 * (1 - c)).astype(x.dtype)
        return jnp.concatenate([f0, m1, m2, f1], axis=1)

    check("tlift", cur(x), lerp(x), 2e-2)
    timeit("tlift via moveaxis-matmul", cur, x)
    timeit("tlift via slice-lerp-concat", lerp, x)


# ---------------- F. trilinear spatial lift 16->128 ----------------


def probe_uplift():
    from smow_net_tpu.ops.resize import interp_matrix, resize_linear

    x = r(k(12), (BS, 2, 16, 16, 32), bf)

    def cur(x):
        return resize_linear(x, (128, 128), (2, 3), align_corners=True)

    mh = jnp.asarray(interp_matrix(16, 128, True), bf)

    def ein(x):
        y = jnp.einsum("bthwc,Hh->btHwc", x, mh)
        return jnp.einsum("btHwc,Ww->btHWc", y, mh)

    check("uplift", cur(x), ein(x), 5e-2)
    timeit("uplift via moveaxis-matmul", cur, x)
    timeit("uplift via einsum pair", ein, x)


# ---------------- G. OFW depthwise down conv ----------------


def probe_dw():
    from smow_net_tpu.ops.convops import conv

    x = r(k(13), (BS, 2, 128, 128, 32), bf)
    w = r(k(14), (3, 3, 3, 1, 32), bf)

    def cur(x, w):
        return conv(x, w, (1, 2, 2), 1, 1, 32)

    def shifts(x, w):
        # depthwise 3x3x3 stride (1,2,2) pad 1 as 27 shifted FMAs on the
        # strided output grid; T=2 with pad 1 -> temporal taps clip
        B, T, H, W, C = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        out = None
        for dt in range(3):
            for dh in range(3):
                for dw_ in range(3):
                    sl = xp[:, dt:dt + T, dh:dh + H:2, dw_:dw_ + W:2, :]
                    term = sl * w[dt, dh, dw_, 0]
                    out = term if out is None else out + term
        return out

    check("dwconv", cur(x, w), shifts(x, w), 1e-1)
    timeit("dw conv3d grouped (XLA)", cur, x, w)
    timeit("dw conv3d as 27 shifted FMAs", shifts, x, w)


# ---------------- H. flow conv (3x3x3, 64->2) ----------------


def probe_flow():
    from smow_net_tpu.ops.convops import conv

    x = r(k(15), (BS, 2, 128, 128, 32), bf)
    y = r(k(16), (BS, 2, 128, 128, 32), bf)
    w = r(k(17), (3, 3, 3, 64, 2), bf)

    def cur(x, y, w):
        return conv(jnp.concatenate([x, y], axis=-1), w, 1, 1)

    def split(x, y, w):
        return conv(x, w[:, :, :, :32], 1, 1) + conv(y, w[:, :, :, 32:], 1, 1)

    check("flow", cur(x, y, w), split(x, y, w), 1e-1)
    timeit("flow conv on concat", cur, x, y, w)
    timeit("flow conv split kernels", split, x, y, w)


def main():
    which = os.environ.get("PROBES", "xattn,token,reduce,head,tlift,uplift,dw,flow")
    for name in which.split(","):
        globals()[f"probe_{name}"]()


if __name__ == "__main__":
    main()
