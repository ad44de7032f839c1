"""Flax linen building blocks with PyTorch-default semantics.

Conventions:
  * channels-last activations; conv kernels stored `(*k, in/groups, out)`
  * init distributions match torch layer defaults (see utils/torch_init)
  * BatchNorm: momentum 0.1 (torch) == flax momentum 0.9, eps 1e-5; callers
    pass `train` and collect the `batch_stats` mutable collection
  * LayerNorm eps 1e-5, GELU exact (erf) — both differ from flax defaults
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import convops
from ..utils import torch_init

__all__ = [
    "Conv",
    "ConvParams",
    "ConvTranspose",
    "Dense",
    "batch_norm",
    "layer_norm",
    "SelfAttentionBlock",
    "FeedForward",
    "TransformerLayer",
    "CrossTransformerLayer",
]


def _prod(xs) -> int:
    out = 1
    for x in xs:
        out *= int(x)
    return out


class Conv(nn.Module):
    """torch Conv{1,2,3}d equivalent (cross-correlation, symmetric padding)."""

    features: int
    kernel_size: Union[int, Sequence[int]]
    strides: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0
    dilation: Union[int, Sequence[int]] = 1
    groups: int = 1
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n = x.ndim - 2
        k = convops.to_tuple(self.kernel_size, n)
        in_c = x.shape[-1]
        fan_in = (in_c // self.groups) * _prod(k)
        kinit = self.kernel_init or torch_init.kaiming_uniform_torch(fan_in)
        kernel = self.param("kernel", kinit, k + (in_c // self.groups, self.features))
        dt = self.dtype or x.dtype
        y = convops.conv(
            x, kernel.astype(dt), self.strides, self.padding, self.dilation, self.groups
        )
        if self.use_bias:
            binit = self.bias_init or torch_init.uniform_fan_in_bias(fan_in)
            y = y + self.param("bias", binit, (self.features,)).astype(dt)
        return y


class ConvParams(nn.Module):
    """Declares Conv/ConvTranspose-compatible kernel+bias params (tree path
    `<name>/{kernel,bias}`) without binding the activation layout, so
    T-folded forward paths can share parameters with the reference-shaped
    modules. `transpose_fan=True` reproduces ConvTranspose's torch fan
    (out-channels based)."""

    shape: Sequence[int]  # (*k, C_in[/groups], C_out)
    use_bias: bool = True
    transpose_fan: bool = False

    @nn.compact
    def __call__(self):
        shape = tuple(self.shape)
        k, cin, cout = shape[:-2], shape[-2], shape[-1]
        fan_in = (cout if self.transpose_fan else cin) * _prod(k)
        kernel = self.param("kernel", torch_init.kaiming_uniform_torch(fan_in), shape)
        bias = None
        if self.use_bias:
            bias = self.param("bias", torch_init.uniform_fan_in_bias(fan_in), (cout,))
        return kernel, bias


class ConvTranspose(nn.Module):
    """torch ConvTranspose{1,2,3}d equivalent (incl. output_padding).

    Kernel is stored in forward-conv layout (*k, in/groups, out); the torch
    weight converter flips/transposes once at load."""

    features: int
    kernel_size: Union[int, Sequence[int]]
    strides: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0
    output_padding: Union[int, Sequence[int]] = 0
    groups: int = 1
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n = x.ndim - 2
        k = convops.to_tuple(self.kernel_size, n)
        in_c = x.shape[-1]
        # torch fans are computed on the (in, out/g, *k) layout
        fan_in = (self.features // self.groups) * _prod(k)
        kinit = self.kernel_init or torch_init.kaiming_uniform_torch(fan_in)
        kernel = self.param("kernel", kinit, k + (in_c // self.groups, self.features))
        dt = self.dtype or x.dtype
        y = convops.conv_transpose(
            x, kernel.astype(dt), self.strides, self.padding, self.output_padding, self.groups
        )
        if self.use_bias:
            binit = self.bias_init or torch_init.uniform_fan_in_bias(fan_in)
            y = y + self.param("bias", binit, (self.features,)).astype(dt)
        return y


class Dense(nn.Module):
    """torch nn.Linear equivalent (kernel stored (in, out))."""

    features: int
    use_bias: bool = True
    kernel_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_c = x.shape[-1]
        kinit = self.kernel_init or torch_init.kaiming_uniform_torch(in_c)
        kernel = self.param("kernel", kinit, (in_c, self.features))
        y = jnp.matmul(x, kernel.astype(x.dtype))
        if self.use_bias:
            b = self.param("bias", torch_init.uniform_fan_in_bias(in_c), (self.features,))
            y = y + b.astype(x.dtype)
        return y


def batch_norm(name: str = "bn", momentum: float = 0.9, eps: float = 1e-5) -> nn.BatchNorm:
    return nn.BatchNorm(momentum=momentum, epsilon=eps, name=name)


def layer_norm(name: str = "ln", eps: float = 1e-5) -> nn.LayerNorm:
    return nn.LayerNorm(epsilon=eps, name=name)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=False)


class SelfAttentionBlock(nn.Module):
    """Multi-head self-attention. Two reference flavours:
      * SMOW (models/SMOW_Net.py:222-251): scale dim_head^-0.5, output
        projection unless (heads==1 and dim_head==dim)  -> scale_by_dim=False
      * BIT (compare/BIT.py:685-717): scale dim^-0.5, always projects
        -> scale_by_dim=True, always_project=True
    """

    dim: int
    heads: int
    dim_head: int
    scale_by_dim: bool = False
    always_project: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inner = self.heads * self.dim_head
        qkv = Dense(inner * 3, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            b, n, _ = t.shape
            return t.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        scale = (self.dim ** -0.5) if self.scale_by_dim else (self.dim_head ** -0.5)
        dots = jnp.einsum("bhid,bhjd->bhij", q, k) * scale
        attn = jax.nn.softmax(dots, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        b, h, n, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        if self.always_project or not (self.heads == 1 and self.dim_head == self.dim):
            out = Dense(self.dim, name="to_out")(out)
        return out


class DenseParams(nn.Module):
    """Declares Dense-compatible params (path `<name>/{kernel,bias}`, torch
    inits) without binding the forward, so fused kernel paths can consume
    the raw arrays while the tree stays converter/checkpoint-identical."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", torch_init.kaiming_uniform_torch(in_features),
            (in_features, self.features))
        bias = None
        if self.use_bias:
            bias = self.param(
                "bias", torch_init.uniform_fan_in_bias(in_features),
                (self.features,))
        return kernel, bias


class LayerNormParams(nn.Module):
    """nn.LayerNorm-compatible params (path `<name>/{scale,bias}`)."""

    @nn.compact
    def __call__(self, dim: int):
        scale = self.param("scale", nn.initializers.ones, (dim,))
        bias = self.param("bias", nn.initializers.zeros, (dim,))
        return scale, bias


class CrossAttnParams(nn.Module):
    """Declares Cross_Attention-compatible params (child `<name>/to_*`,
    Dense-identical inits) and returns the raw arrays for fused paths."""

    dim: int
    heads: int

    @nn.compact
    def __call__(self, m_dim: int):
        inner = self.heads
        wq, _ = DenseParams(inner, use_bias=False, name="to_q")(self.dim)
        wk, _ = DenseParams(inner, use_bias=False, name="to_k")(m_dim)
        wv, _ = DenseParams(inner, use_bias=False, name="to_v")(m_dim)
        wo, bo = DenseParams(self.dim, name="to_out")(inner)
        return wq, wk, wv, wo, bo


class FFParams(nn.Module):
    """Declares FeedForward-compatible params (child `<name>/fc{1,2}`)."""

    dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        w1, b1 = DenseParams(self.hidden, name="fc1")(self.dim)
        w2, b2 = DenseParams(self.dim, name="fc2")(self.hidden)
        return w1, b1, w2, b2


class CrossAttentionBlock(nn.Module):
    """Reference `Cross_Attention` (models/SMOW_Net.py:337-381). NB the
    reference instantiates it with dim_head=True -> per-head dim 1 and
    scale dim^-0.5; we reproduce those semantics faithfully."""

    dim: int
    heads: int
    dim_head: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
        inner = self.heads * self.dim_head
        q = Dense(inner, use_bias=False, name="to_q")(x)
        k = Dense(inner, use_bias=False, name="to_k")(m)
        v = Dense(inner, use_bias=False, name="to_v")(m)
        scale = self.dim ** -0.5

        if self.dim_head == 1:
            # per-head dim 1 (the reference's dim_head=True quirk): the
            # "attention" is an outer product over the few memory tokens —
            # keep the (B, N, heads) layout so the 16k-pixel query tensor is
            # never transposed; only the tiny (B, M, heads) memory moves.
            # Everything is broadcast-multiply + lane reduction: an einsum
            # here lowers to batched matmuls over the tiny h axis, which XLA
            # pays for with full-tensor transposes (measured +4 ms).
            kT = k.transpose(0, 2, 1)[:, None]          # (B, 1, h, M)
            vT = v.transpose(0, 2, 1)[:, None]
            dots = q[:, :, :, None] * kT * scale        # (B, N, h, M)
            attn = jax.nn.softmax(dots, axis=-1)
            out = jnp.sum(attn * vT, axis=-1)           # (B, N, h)
            return Dense(self.dim, name="to_out")(out)

        def heads(t):
            b, n, _ = t.shape
            return t.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        dots = jnp.einsum("bhid,bhjd->bhij", q, k) * scale
        attn = jax.nn.softmax(dots, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        b, h, n, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        return Dense(self.dim, name="to_out")(out)


class FeedForward(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = Dense(self.hidden, name="fc1")(x)
        x = gelu(x)
        return Dense(self.dim, name="fc2")(x)


class TransformerLayer(nn.Module):
    """PreNorm(attn) + x; PreNorm(ff) + x (reference Transformer,
    models/SMOW_Net.py:193-208)."""

    dim: int
    heads: int
    dim_head: int
    mlp_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = SelfAttentionBlock(self.dim, self.heads, self.dim_head, name="attn")(
            layer_norm(name="norm1")(x)
        ) + x
        x = FeedForward(self.dim, self.mlp_dim, name="ff")(layer_norm(name="norm2")(x)) + x
        return x


class CrossTransformerLayer(nn.Module):
    """Reference TransformerDecoder layer (models/SMOW_Net.py:285-303):
    a single shared LayerNorm normalizes both query and memory (PreNorm2)."""

    dim: int
    heads: int
    dim_head: int
    mlp_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, m: jnp.ndarray,
                 perm=None) -> jnp.ndarray:
        if self.dim_head == 1:
            # dim_head=1 hot path: raw-param route so the fused TPU kernel
            # (ops/pallas/xattn.py) can absorb the WHOLE layer — LN1,
            # projections, softmax, residual, LN2, MLP, residual — in one
            # HBM pass; param tree unchanged. (An eval-time classifier-fold
            # epilogue variant was probed on chip and LOST at whole-model
            # scale on both models — smow_net 12.85 -> 13.24 ms/b, LW 9.72
            # -> 9.96; artifacts/bench_r04/head_ab{,_lw}.txt — and was
            # removed.)
            from ..ops.xattn import cross_layer_head1_auto

            g1, b1 = LayerNormParams(name="norm1")(self.dim)
            wq, wk, wv, wo, bo = CrossAttnParams(
                self.dim, self.heads, name="attn")(m.shape[-1])
            g2, b2 = LayerNormParams(name="norm2")(self.dim)
            w1, bb1, w2, bb2 = FFParams(self.dim, self.mlp_dim, name="ff")()
            dt = m.dtype
            m32 = m.astype(jnp.float32)
            mu = jnp.mean(m32, axis=-1, keepdims=True)
            var = jnp.mean(m32 * m32, axis=-1, keepdims=True) - mu * mu
            m_n = ((m32 - mu) * jax.lax.rsqrt(var + 1e-5)
                   * g1 + b1).astype(dt)
            k = jnp.matmul(m_n, wk.astype(dt))
            v = jnp.matmul(m_n, wv.astype(dt))
            return cross_layer_head1_auto(
                x, g1, b1, wq, k, v, wo, bo, g2, b2, w1, bb1, w2, bb2,
                scale=self.dim ** -0.5, perm=perm)
        assert perm is None, "perm folding only on the dim_head=1 path"
        norm = layer_norm(name="norm1")
        x = CrossAttentionBlock(self.dim, self.heads, self.dim_head, name="attn")(
            norm(x), norm(m)
        ) + x
        x = FeedForward(self.dim, self.mlp_dim, name="ff")(layer_norm(name="norm2")(x)) + x
        return x
