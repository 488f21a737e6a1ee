"""AnchorDETR transformer in Flax: RCDA encoder over the H x W feature map,
decoder over anchor-point queries, shared prediction heads.

Structure mirrors the reference (models/transformer.py:20-214 stage 1,
:82-215 stage 2) with TPU-first changes:
  * fixed shapes + padding masks everywhere (one XLA program per bucket);
  * (B, L, E) / NHWC layouts, no torch (L, B, E) transposes;
  * decoder self-attention masks PADDED QUERIES (the reference never pads
    queries because it runs batch=1 with dynamic shapes);
  * the decoder heads are a single parameter set applied after every layer —
    the reference expresses this as a ModuleList holding the same module 6x
    (transformer.py:96-97).
"""

from __future__ import annotations

import math
import os
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from countdetr_tpu.config import ModelConfig
from countdetr_tpu.ops import rcda as rcda_ops
from countdetr_tpu.ops.boxes import inverse_sigmoid
from countdetr_tpu.ops.posemb import mask2pos, pos2posemb1d, pos2posemb2d


def _xavier_uniform_rows(key, shape, dtype=jnp.float32):
    """torch nn.init.xavier_uniform_ on a (out, in) matrix."""
    import jax

    fan_out, fan_in = shape
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


class TorchLinear(nn.Module):
    """Linear with torch's (out, in) weight layout so packed-checkpoint
    imports are transpose-free; init matches torch.nn.Linear defaults."""

    features: int
    use_bias: bool = True
    weight_init: Optional[str] = None  # None->kaiming-uniform, "zeros", "xavier"
    weight_fill: Optional[float] = None
    bias_fill: Optional[float] = None

    @nn.compact
    def __call__(self, x):
        import jax

        fan_in = x.shape[-1]

        def w_init(key, shape, dtype=jnp.float32):
            if self.weight_fill is not None:
                return jnp.full(shape, self.weight_fill, dtype)
            if self.weight_init == "zeros":
                return jnp.zeros(shape, dtype)
            if self.weight_init == "xavier":
                return _xavier_uniform_rows(key, shape, dtype)
            bound = 1.0 / math.sqrt(fan_in)
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        w = self.param("weight", w_init, (self.features, fan_in))
        y = x @ w.T.astype(x.dtype)
        if self.use_bias:

            def b_init(key, shape, dtype=jnp.float32):
                if self.bias_fill is not None:
                    return jnp.full(shape, self.bias_fill, dtype)
                bound = 1.0 / math.sqrt(fan_in)
                return jax.random.uniform(key, shape, dtype, -bound, bound)

            y = y + self.param("bias", b_init, (self.features,)).astype(x.dtype)
        return y


class MLP(nn.Module):
    """(reference transformer.py:427-437) — relu between layers."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    last_weight_fill: Optional[float] = None
    last_bias_fill: Optional[float] = None
    last_zero: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            feats = self.output_dim if last else self.hidden_dim
            kw = {}
            if last:
                if self.last_zero:
                    kw = dict(weight_init="zeros", bias_fill=0.0)
                if self.last_weight_fill is not None:
                    kw = dict(
                        weight_fill=self.last_weight_fill,
                        bias_fill=self.last_bias_fill,
                    )
            x = TorchLinear(feats, name=f"layers_{i}", **kw)(x)
            if not last:
                x = nn.relu(x)
        return x


class AdaptPos(nn.Module):
    """2-layer MLP applied to sinusoidal embeddings
    (reference transformer.py:72-73)."""

    d_model: int

    @nn.compact
    def __call__(self, x):
        x = TorchLinear(self.d_model, name="0")(x)
        x = nn.relu(x)
        return TorchLinear(self.d_model, name="2")(x)


class RCDAAttention(nn.Module):
    """Parameter container for RCDA; packed (5E, E) like the reference
    (row_column_decoupled_attention.py:347-358) for checkpoint portability."""

    d_model: int
    num_heads: int
    use_pallas: bool = False

    @nn.compact
    def __call__(self, query_row, query_col, key_row, key_col, value, key_padding_mask=None):
        E = self.d_model
        dt = query_row.dtype
        params = rcda_ops.RCDAParams(
            in_proj_weight=self.param(
                "in_proj_weight", _xavier_uniform_rows, (5 * E, E)
            ).astype(dt),
            in_proj_bias=self.param(
                "in_proj_bias", nn.initializers.zeros, (5 * E,)
            ).astype(dt),
            out_proj_weight=self.param(
                "out_proj_weight",
                lambda k, s, d=jnp.float32: _kaiming_uniform(k, s, d),
                (E, E),
            ).astype(dt),
            out_proj_bias=self.param(
                "out_proj_bias", nn.initializers.zeros, (E,)
            ).astype(dt),
        )
        return rcda_ops.rcda_attention(
            query_row, query_col, key_row, key_col, value,
            params, self.num_heads, key_padding_mask,
            use_pallas=self.use_pallas,
        )


def _kaiming_uniform(key, shape, dtype=jnp.float32):
    import jax

    fan_in = shape[1]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class MHAttention(nn.Module):
    """torch-packed standard MHA parameters (3E, E)."""

    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, query, key, value, key_padding_mask=None):
        E = self.d_model
        dt = query.dtype
        w = self.param("in_proj_weight", _xavier_uniform_rows, (3 * E, E)).astype(dt)
        b = self.param("in_proj_bias", nn.initializers.zeros, (3 * E,)).astype(dt)
        ow = self.param("out_proj_weight", _kaiming_uniform, (E, E)).astype(dt)
        ob = self.param("out_proj_bias", nn.initializers.zeros, (E,)).astype(dt)
        return rcda_ops.mha_attention(
            query, key, value, w, b, ow, ob, self.num_heads, key_padding_mask
        )


class FFN(nn.Module):
    """post-LN feed-forward block (reference transformer.py:410-424):
    dropout after the activation and on the block output."""

    d_model: int
    d_ffn: int
    dropout: float = 0.0
    deterministic: bool = True

    @nn.compact
    def __call__(self, x):
        h = TorchLinear(self.d_ffn, name="linear1")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=self.deterministic)
        h = TorchLinear(self.d_model, name="linear2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=self.deterministic)
        x = x + h
        return nn.LayerNorm(epsilon=1e-5, dtype=x.dtype, name="norm2")(x)


class EncoderLayer(nn.Module):
    """RCDA self-attention over the feature map
    (reference transformer.py:217-278)."""

    d_model: int
    d_ffn: int
    num_heads: int
    attention_type: str = "RCDA"
    use_pallas: bool = False
    dropout: float = 0.0
    deterministic: bool = True

    @nn.compact
    def __call__(self, src, pad_mask, posemb_row, posemb_col, posemb_2d=None):
        B, H, W, C = src.shape
        if self.attention_type == "RCDA":
            q_row_in = src + posemb_row[:, None, :, :]  # (B,H,W,C)
            q_col_in = src + posemb_col[:, :, None, :]
            # queries stay in grid form (B,H,W,C): merging H*W here costs a
            # relayout copy per layer on TPU (ops/rcda.py grid-query path)
            src2 = RCDAAttention(
                self.d_model, self.num_heads, self.use_pallas, name="self_attn"
            )(
                q_row_in,
                q_col_in,
                q_row_in,
                q_col_in,
                src,
                key_padding_mask=pad_mask,
            )
        else:
            q = (src + posemb_2d).reshape(B, H * W, C)
            src2 = MHAttention(self.d_model, self.num_heads, name="self_attn")(
                q, q, src.reshape(B, H * W, C),
                key_padding_mask=pad_mask.reshape(B, H * W),
            ).reshape(B, H, W, C)

        src2 = nn.Dropout(self.dropout)(src2, deterministic=self.deterministic)
        src = src + src2
        src = nn.LayerNorm(epsilon=1e-5, dtype=src.dtype, name="norm1")(src)
        return FFN(self.d_model, self.d_ffn, self.dropout,
                   self.deterministic, name="ffn")(src)


class LevelEncoderLayer(nn.Module):
    """Attention ACROSS feature levels, per pixel (reference
    TransformerEncoderLayerLevel, transformer.py:281-312). Active only when
    num_feature_levels > 1."""

    d_model: int
    d_ffn: int
    num_heads: int
    dropout: float = 0.0
    deterministic: bool = True

    @nn.compact
    def __call__(self, src, level_emb):
        # src: (B, l, H, W, C); level_emb: (l, C)
        B, l, H, W, C = src.shape
        x = src.transpose(0, 2, 3, 1, 4).reshape(B * H * W, l, C)
        qk = x + level_emb[None, :, :].astype(x.dtype)
        x2 = MHAttention(self.d_model, self.num_heads, name="self_attn_level")(
            qk, qk, x
        )
        x2 = nn.Dropout(self.dropout)(x2, deterministic=self.deterministic)
        x = x + x2
        x = nn.LayerNorm(epsilon=1e-5, dtype=x.dtype, name="norm1")(x)
        x = FFN(self.d_model, self.d_ffn, self.dropout,
                self.deterministic, name="ffn")(x)
        return x.reshape(B, H, W, l, C).transpose(0, 3, 1, 2, 4)


class DecoderLayer(nn.Module):
    """query self-attention + RCDA cross-attention
    (reference transformer.py:315-407)."""

    d_model: int
    d_ffn: int
    num_heads: int
    attention_type: str = "RCDA"
    use_pallas: bool = False

    num_levels: int = 1
    dropout: float = 0.0
    deterministic: bool = True

    @nn.compact
    def __call__(
        self,
        tgt,  # (B, L, C)
        query_pos,  # (B, L, C) 2-D sinusoidal of reference points
        query_pos_x,  # (B, L, C) 1-D of ref x
        query_pos_y,  # (B, L, C) 1-D of ref y
        src,  # (B*l, H, W, C) feature levels folded into batch
        pad_mask,  # (B*l, H, W)
        posemb_row,  # (B*l, W, C)
        posemb_col,  # (B*l, H, C)
        query_valid=None,  # (B, L) bool — mask padded queries
        posemb_2d=None,
    ):
        B, L, C = tgt.shape
        l = self.num_levels
        q = k = tgt + query_pos
        q_pad = None if query_valid is None else ~query_valid
        tgt2 = MHAttention(self.d_model, self.num_heads, name="self_attn")(
            q, k, tgt, key_padding_mask=q_pad
        )
        tgt2 = nn.Dropout(self.dropout)(tgt2, deterministic=self.deterministic)
        tgt = tgt + tgt2
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=tgt.dtype, name="norm2")(tgt)

        def tile_l(x):  # (B, L, C) -> (B*l, L, C), level-major like the
            # reference's .repeat(l, 1, 1) (transformer.py:384)
            return jnp.tile(x, (l, 1, 1)) if l > 1 else x

        if self.attention_type == "RCDA":
            k_row = src + posemb_row[:, None, :, :]
            k_col = src + posemb_col[:, :, None, :]
            tgt2 = RCDAAttention(
                self.d_model, self.num_heads, self.use_pallas, name="cross_attn"
            )(
                tile_l(tgt + query_pos_x), tile_l(tgt + query_pos_y),
                k_row, k_col, src,
                key_padding_mask=pad_mask,
            )
        else:
            H, W = src.shape[1], src.shape[2]
            tgt2 = MHAttention(self.d_model, self.num_heads, name="cross_attn")(
                tile_l(tgt + query_pos),
                (src + posemb_2d).reshape(src.shape[0], H * W, C),
                src.reshape(src.shape[0], H * W, C),
                key_padding_mask=pad_mask.reshape(src.shape[0], H * W),
            )
        if l > 1:
            # merge levels (reference transformer.py:398-401). The flattened
            # layout is c-major with LEVEL FASTEST (the reference's
            # .permute(0,2,3,1).reshape(bz, tgt_len, c*l)) — level_fc weights
            # import 1:1 only in this order.
            tgt2 = tgt2.reshape(l, B, L, C).transpose(1, 2, 3, 0).reshape(B, L, C * l)
            tgt2 = TorchLinear(C, name="level_fc")(tgt2)
        tgt2 = nn.Dropout(self.dropout)(tgt2, deterministic=self.deterministic)
        tgt = tgt + tgt2
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=tgt.dtype, name="norm1")(tgt)
        return FFN(self.d_model, self.d_ffn, self.dropout,
                   self.deterministic, name="ffn")(tgt)


class Transformer(nn.Module):
    """Full encoder-decoder over one feature level.

    __call__ inputs:
      src:        (B, H, W, C) projected backbone features
      pad_mask:   (B, H, W) bool, True on padding
      reference_points: (B, P, 2) anchor points in [0, 1] (from the spatial
        prior; for 'defined'/'sampled' these are the data points)
      query_valid: (B, P) bool or None

    Returns dict with stacked per-decoder-layer outputs:
      cls:  (D, B, L, num_classes)
      coord:(D, B, L, 4) sigmoid cxcywh (xy anchored at reference points)
      var:  (D, B, L, 2) if with_variance_head
      reference_points: (B, L, 2)
    where L = P * num_query_pattern.
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, src, pad_mask, reference_points, query_valid=None,
                 train: bool = False):
        cfg = self.cfg
        det = not train  # dropout deterministic flag
        dt = jnp.dtype(cfg.compute_dtype)
        src = src.astype(dt)
        # multi-level input arrives as (B, l, H, W, C); levels fold into the
        # batch dim LEVEL-MAJOR for the spatial encoder/cross-attention
        # (reference transformer.py:161 — it runs batch=1 so its b-major vs
        # level-major distinction never materializes; we pick level-major
        # consistently)
        nlv = cfg.num_feature_levels
        if src.ndim == 5:
            B = src.shape[0]
            assert src.shape[1] == nlv
            src = src.transpose(1, 0, 2, 3, 4).reshape(-1, *src.shape[2:])
            pad_mask = jnp.tile(pad_mask, (nlv, 1, 1))
        else:
            assert nlv == 1
            B = src.shape[0]
        _, H, W, C = src.shape
        P = reference_points.shape[1]
        npat = cfg.num_query_pattern
        L = P * npat

        # queries: pattern embeddings tiled over positions (pattern-major,
        # reference transformer.py:139-143)
        pattern = self.param(
            "pattern", nn.initializers.normal(1.0), (npat, cfg.hidden_dim)
        )
        tgt = jnp.broadcast_to(
            pattern[None, :, None, :].astype(dt), (B, npat, P, cfg.hidden_dim)
        ).reshape(B, L, cfg.hidden_dim)
        ref = jnp.tile(reference_points, (1, npat, 1))  # (B, L, 2)
        qvalid = None if query_valid is None else jnp.tile(query_valid, (1, npat))

        adapt_pos1d = AdaptPos(cfg.hidden_dim, name="adapt_pos1d")
        adapt_pos2d = AdaptPos(cfg.hidden_dim, name="adapt_pos2d")

        pos_col, pos_row = mask2pos(pad_mask)  # (B, H), (B, W)
        if cfg.attention_type == "RCDA":
            posemb_row = adapt_pos1d(pos2posemb1d(pos_row, cfg.hidden_dim).astype(dt))
            posemb_col = adapt_pos1d(pos2posemb1d(pos_col, cfg.hidden_dim).astype(dt))
            posemb_2d = None
        else:
            pos2d = jnp.stack(
                [
                    jnp.broadcast_to(pos_row[:, None, :], (B, H, W)),
                    jnp.broadcast_to(pos_col[:, :, None], (B, H, W)),
                ],
                axis=-1,
            )
            posemb_2d = adapt_pos2d(pos2posemb2d(pos2d, cfg.hidden_dim // 2).astype(dt))
            posemb_row = posemb_col = None

        # layer split with levels (reference transformer.py:51-58): half the
        # encoder layers get a cross-level attention layer interleaved
        n_level_layers = 0 if nlv == 1 else cfg.enc_layers // 2
        n_spatial = cfg.enc_layers - n_level_layers
        if nlv > 1:
            level_embed = self.param(
                "level_embed", nn.initializers.normal(1.0), (nlv, cfg.hidden_dim)
            )

        # optional rematerialization: recompute layer activations in the
        # backward pass instead of storing them (HBM <-> FLOPs trade)
        enc_ctor = EncoderLayer
        dec_ctor = DecoderLayer
        if cfg.remat:
            enc_ctor = nn.remat(EncoderLayer, static_argnums=())
            dec_ctor = nn.remat(DecoderLayer, static_argnums=())

        # COUNTDETR_PALLAS_RCDA_SCOPE: where use_pallas_rcda applies
        # (all | encoder | decoder) — the kernel's win/loss differs between
        # the L=H*W grid-query encoder and the L=num_queries decoder
        # (PERFORMANCE.md round-5 combine table), so A/Bs need the split.
        scope = os.environ.get("COUNTDETR_PALLAS_RCDA_SCOPE", "encoder")
        enc_pallas = cfg.use_pallas_rcda and scope in ("all", "encoder")
        dec_pallas = cfg.use_pallas_rcda and scope in ("all", "decoder")

        x = src
        for i in range(n_spatial):
            x = enc_ctor(
                cfg.hidden_dim, cfg.dim_feedforward, cfg.nheads,
                cfg.attention_type, enc_pallas, cfg.dropout, det,
                name=f"encoder_{i}",
            )(x, pad_mask, posemb_row, posemb_col, posemb_2d)
            if i < n_level_layers:
                x5 = x.reshape(nlv, B, H, W, C).transpose(1, 0, 2, 3, 4)
                x5 = LevelEncoderLayer(
                    cfg.hidden_dim, cfg.dim_feedforward, cfg.nheads,
                    cfg.dropout, det, name=f"encoder_level_{i}",
                )(x5, level_embed)
                x = x5.transpose(1, 0, 2, 3, 4).reshape(nlv * B, H, W, C)

        query_pos = adapt_pos2d(pos2posemb2d(ref, cfg.hidden_dim // 2).astype(dt))
        if cfg.attention_type == "RCDA":
            query_pos_x = adapt_pos1d(pos2posemb1d(ref[..., 0], cfg.hidden_dim).astype(dt))
            query_pos_y = adapt_pos1d(pos2posemb1d(ref[..., 1], cfg.hidden_dim).astype(dt))
        else:
            query_pos_x = query_pos_y = None

        # shared heads — ONE parameter set used after every decoder layer
        cls_embed = TorchLinear(
            cfg.num_classes,
            bias_fill=-math.log((1 - 0.01) / 0.01),
            name="cls_embed",
        )
        bbox_embed = MLP(cfg.hidden_dim, 4, 3, last_zero=True, name="bbox_embed")
        if cfg.with_variance_head:
            bbox_variance = MLP(
                cfg.hidden_dim, 2, 3,
                last_weight_fill=0.01, last_bias_fill=0.01,
                name="bbox_variance",
            )

        # the -2.0 wh bias (reference transformer.py:95) is added explicitly
        # because flax params can't be partially initialized; equivalent to
        # bbox_embed.layers[-1].bias = [0, 0, -2, -2].
        wh_bias = jnp.array([0.0, 0.0, -2.0, -2.0])

        out = tgt
        classes, coords, variances = [], [], []
        ref_logit = inverse_sigmoid(ref)
        for i in range(cfg.dec_layers):
            out = dec_ctor(
                cfg.hidden_dim, cfg.dim_feedforward, cfg.nheads,
                cfg.attention_type, dec_pallas, nlv, cfg.dropout,
                det, name=f"decoder_{i}",
            )(
                out, query_pos, query_pos_x, query_pos_y, x, pad_mask,
                posemb_row, posemb_col, qvalid, posemb_2d,
            )
            classes.append(cls_embed(out).astype(jnp.float32))
            delta = bbox_embed(out).astype(jnp.float32) + wh_bias
            delta = delta.at[..., :2].add(ref_logit)
            coords.append(nn.sigmoid(delta))
            if cfg.with_variance_head:
                variances.append(bbox_variance(out).astype(jnp.float32))

        result = {
            "cls": jnp.stack(classes),  # (D, B, L, num_classes)
            "coord": jnp.stack(coords),  # (D, B, L, 4)
            "reference_points": ref,
            "hs": out,  # (B, L, C) last decoder hidden states (mask head)
            "memory": x,  # (B*l, H, W, C) encoder output (mask head)
        }
        if cfg.with_variance_head:
            result["var"] = jnp.stack(variances)
        return result
