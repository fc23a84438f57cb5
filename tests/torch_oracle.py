"""A torch oracle implementing the reference TransformerXL arithmetic
(reference: src/model/transformer_xl.py, src/tokenizer/vision_embedding.py),
used purely as a parity target for the JAX model + checkpoint converter.

Parameter names intentionally match the reference state-dict layout so the
converter (bdm_db1_tpu/train/convert.py) maps them verbatim. This is a test
asset, not part of the framework.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class OraclePosEmb(nn.Module):
    def __init__(self, d):
        super().__init__()
        self.register_buffer(
            "inv_freq", 1.0 / (10000 ** (torch.arange(0.0, d, 2.0) / d))
        )

    def forward(self, pos_seq):
        ang = torch.outer(pos_seq, self.inv_freq)
        return torch.cat([ang.sin(), ang.cos()], dim=-1)[None]


def _rel_shift(x):  # [b, q, k, h]
    b, q, k, h = x.shape
    zp = torch.zeros((b, q, 1, h), dtype=x.dtype)
    xp = torch.cat([zp, x], dim=2).view(b, k + 1, q, h)
    return xp[:, 1:].reshape(b, q, k, h)


class OracleAttn(nn.Module):
    def __init__(self, n_head, d_model, pre_lnorm, r_w_bias, r_r_bias, eps):
        super().__init__()
        self.n_head, self.d_head = n_head, d_model // n_head
        self.qkv_net = nn.Linear(d_model, 3 * d_model, bias=False)
        self.o_net = nn.Linear(d_model, d_model, bias=False)
        self.r_net = nn.Linear(d_model, d_model, bias=False)
        self.layer_norm = nn.LayerNorm(d_model, eps=eps)
        self.pre_lnorm = pre_lnorm
        if r_w_bias is None or r_r_bias is None:  # untied biases
            self.r_w_bias = nn.Parameter(
                torch.randn(n_head, self.d_head) * 0.02)
            self.r_r_bias = nn.Parameter(
                torch.randn(n_head, self.d_head) * 0.02)
        else:
            self.r_w_bias, self.r_r_bias = r_w_bias, r_r_bias
        self.scale = 1 / (self.d_head ** 0.5)

    def forward(self, w, r, mem, attention_mask, alpha=1.0):
        qlen, bsz = w.size(1), w.size(0)
        cat = torch.cat([mem, w], 1) if mem is not None else w
        heads = self.qkv_net(self.layer_norm(cat) if self.pre_lnorm else cat)
        q, k, v = torch.chunk(heads, 3, dim=-1)
        q = q[:, -qlen:]
        rk = self.r_net(r)
        klen = k.size(1)
        q = q.view(bsz, qlen, self.n_head, self.d_head)
        k = k.view(bsz, klen, self.n_head, self.d_head)
        v = v.view(bsz, klen, self.n_head, self.d_head)
        rk = rk.view(klen, self.n_head, self.d_head)

        ac = torch.einsum("bind,bjnd->bijn", (q + self.r_w_bias).float(), k.float())
        bd = _rel_shift(
            torch.einsum("bind,jnd->bijn", (q + self.r_r_bias).float(), rk.float())
        )
        score = (ac + bd) * self.scale
        score = score.float().masked_fill(
            attention_mask[None, :, :, None].bool(), -1e30
        )
        prob = F.softmax(score, dim=2).type_as(v)
        vec = torch.einsum("bijn,bjnd->bind", prob, v).reshape(bsz, qlen, -1)
        out = self.o_net(vec)
        if self.pre_lnorm:
            return w + out
        return self.layer_norm(w * alpha + out)


class OracleFF(nn.Module):
    def __init__(self, d_model, d_inner, activation, pre_lnorm, eps):
        super().__init__()
        out_in = d_inner // 2 if activation == "geglu" else d_inner
        self.CoreNet = nn.Sequential(
            nn.Linear(d_model, d_inner), nn.Identity(),
            nn.Linear(out_in, d_model), nn.Identity(),
        )
        self.activation = activation
        self.layer_norm = nn.LayerNorm(d_model, eps=eps)
        self.pre_lnorm = pre_lnorm

    def _act(self, x):
        if self.activation == "geglu":
            a, b = x.chunk(2, dim=-1)
            return a * F.gelu(b)
        return F.gelu(x)

    def forward(self, x, alpha=1.0):
        inp = self.layer_norm(x) if self.pre_lnorm else x
        h = self.CoreNet[2](self._act(self.CoreNet[0](inp)))
        if self.pre_lnorm:
            return h + x
        return self.layer_norm(x * alpha + h)


class OracleLayer(nn.Module):
    def __init__(self, cfg, r_w_bias, r_r_bias):
        super().__init__()
        self.dec_attn = OracleAttn(
            cfg.n_head, cfg.n_embed, cfg.pre_lnorm, r_w_bias, r_r_bias,
            cfg.layer_norm_epsilon,
        )
        self.pos_ff = OracleFF(
            cfg.n_embed, cfg.d_inner, cfg.activation_fn, cfg.pre_lnorm,
            cfg.layer_norm_epsilon,
        )

    def forward(self, h, r, mem, mask, alpha=1.0):
        return self.pos_ff(self.dec_attn(h, r, mem, mask, alpha), alpha)


class OraclePatchEmb(nn.Module):
    def __init__(self, patch_size, channels, d):
        super().__init__()
        self.patch_size = patch_size
        self.conv1 = nn.Conv2d(channels, 64, 3, 1, 1)
        self.projection = nn.Conv2d(64, d, patch_size, patch_size)
        self.residual_path = nn.Sequential(
            nn.GroupNorm(32, 64), nn.GELU(), nn.Conv2d(64, 64, 3, 1, 1),
            nn.GroupNorm(32, 64), nn.GELU(), nn.Conv2d(64, 64, 3, 1, 1),
        )

    def forward(self, px):  # [B, C, H, W]
        b, c, H, W = px.shape
        p = self.patch_size
        x = px.reshape(b, c, H // p, p, W // p, p)
        x = x.permute(0, 2, 4, 1, 3, 5).reshape(-1, c, p, p)
        x = (x - x.mean(dim=(-2, -1), keepdim=True)) / (
            1e-6 + x.std(dim=(-2, -1), keepdim=True)
        )
        x = x / math.sqrt(p)
        x = self.conv1(x)
        x = x + self.residual_path(x)
        x = self.projection(x)
        return x.view(b, -1, x.shape[1])


class OracleVision(nn.Module):
    def __init__(self, cfg, vision):
        super().__init__()
        self.patch_embeddings = OraclePatchEmb(
            vision.patch_size, vision.num_input_channels, cfg.n_embed
        )
        self.row_position_embeddings = nn.Embedding(
            vision.position_vocab_size, cfg.n_embed)
        self.col_position_embeddings = nn.Embedding(
            vision.position_vocab_size, cfg.n_embed)
        self.pv = vision.position_vocab_size
        self.p = vision.patch_size

    def forward(self, px):  # eval mode (midpoint position ids)
        b, c, H, W = px.shape
        emb = self.patch_embeddings(px)
        h0, w0 = H // self.p, W // self.p
        idx = torch.arange(h0 * w0)
        row, col = idx // w0, idx % w0
        rl = (row / h0 * self.pv).int()
        rh = ((row + 1) / h0 * self.pv).int()
        cl = (col / w0 * self.pv).int()
        ch = ((col + 1) / w0 * self.pv).int()
        rid = ((rl + rh) / 2).int()[None]
        cid = ((cl + ch) / 2).int()[None]
        return emb + self.row_position_embeddings(rid) + \
            self.col_position_embeddings(cid)


class OracleTXL(nn.Module):
    """Reference-equivalent TransformerXL over RL token batches."""

    def __init__(self, cfg, vocab, vision):
        super().__init__()
        self.cfg = cfg
        layout = vocab.layout()
        self.total_vocab = layout.total_vocab_size
        self.word_embedding = nn.Embedding(self.total_vocab, cfg.n_embed)
        self.rl_local_timestep_embedding = nn.Embedding(513, cfg.n_embed)
        self.pos_emb = OraclePosEmb(cfg.n_embed)
        if not cfg.untie_r:
            self.r_w_bias = nn.Parameter(torch.randn(cfg.n_head, cfg.d_head) * 0.02)
            self.r_r_bias = nn.Parameter(torch.randn(cfg.n_head, cfg.d_head) * 0.02)
        self.h = nn.ModuleList([
            OracleLayer(cfg,
                        None if cfg.untie_r else self.r_w_bias,
                        None if cfg.untie_r else self.r_r_bias)
            for _ in range(cfg.n_layer)
        ])
        self.vision_encoder = OracleVision(cfg, vision)

    def init_mem(self, bsz):
        return [torch.zeros(bsz, self.cfg.mem_len, self.cfg.n_embed)
                for _ in range(self.cfg.n_layer)]

    @torch.no_grad()
    def forward(self, tokens, position_id, mems=None, images=None):
        cfg = self.cfg
        emb = self.word_embedding(tokens.clamp(min=0))
        emb = emb * (tokens >= 0)[..., None]
        if images is not None:
            b = tokens.shape[0]
            vis = self.vision_encoder(images.reshape(-1, *images.shape[-3:]))
            vis = vis.reshape(b, -1, cfg.n_embed)
            mask = tokens < 0
            idx = (mask.cumsum(1) - 1).clamp(min=0)
            gathered = torch.gather(
                vis, 1, idx[..., None].expand(-1, -1, cfg.n_embed))
            emb = torch.where(mask[..., None], gathered, emb)
        h = emb + self.rl_local_timestep_embedding(position_id)

        qlen = h.size(1)
        mlen = mems[0].size(1) if mems is not None else 0
        klen = mlen + qlen
        ones = torch.ones(qlen, klen, dtype=torch.uint8)
        if cfg.same_length:
            mask_len = klen - cfg.mem_len
            shift = qlen - mask_len if mask_len > 0 else qlen
            am = torch.triu(ones, 1 + mlen) + torch.tril(ones, -shift)
        else:
            am = torch.triu(ones, 1 + mlen)

        pos_seq = torch.arange(klen - 1, -1, -1.0).clamp(
            max=cfg.effective_clamp_len)
        r = self.pos_emb(pos_seq)[0]

        # DeepNorm residual scaling (reference: transformer_xl.py:231-238,
        # alpha = (2N)^0.25 on the post-LN residual branch)
        alpha = ((2 * cfg.n_layer) ** 0.25
                 if getattr(cfg, "use_deepnorm", False) else 1.0)
        hids, new_mems = [], []
        for i, layer in enumerate(self.h):
            hids.append(h)
            h = layer(h, r, None if mems is None else mems[i], am, alpha)
        if mems is not None:
            for i in range(len(hids)):
                cat = torch.cat([mems[i], hids[i]], dim=1)
                new_mems.append(cat[:, -cfg.mem_len:])
        logits = F.linear(h, self.word_embedding.weight)
        return logits, (new_mems if mems is not None else None)
