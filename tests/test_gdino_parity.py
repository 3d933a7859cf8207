"""GroundingDINO numeric parity for the hard primitives (VERDICT r1
item 4): multi-scale deformable attention vs the standard torch
`grid_sample`-based algorithm (the math the official CUDA op and its
pytorch fallback implement), and Swin window attention vs a torch
mirror of the official Swin block."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from instructany2pix_tpu.grounding import gdino as gdino_lib

torch = pytest.importorskip("torch")
F = torch.nn.functional


def t_ms_deform_attn_core(value, shapes, locs, weights):
    """Standard multi_scale_deformable_attn_pytorch (mmcv/official
    fallback): bilinear grid_sample per level, zeros padding,
    align_corners=False.

    value: (B, sumHW, heads, hd); locs: (B, Nq, heads, L, P, 2) in [0,1];
    weights: (B, Nq, heads, L, P). → (B, Nq, heads*hd)
    """
    bs, _, heads, hd = value.shape
    _, nq, _, levels, points, _ = locs.shape
    splits = [h * w for h, w in shapes]
    value_list = value.split(splits, dim=1)
    grids = 2 * locs - 1
    sampled = []
    for li, (h, w) in enumerate(shapes):
        v = value_list[li].flatten(2).transpose(1, 2).reshape(bs * heads, hd, h, w)
        g = grids[:, :, :, li].transpose(1, 2).flatten(0, 1)  # (B*heads, Nq, P, 2)
        s = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros",
                          align_corners=False)
        sampled.append(s)  # (B*heads, hd, Nq, P)
    w_ = weights.transpose(1, 2).reshape(bs * heads, 1, nq, levels * points)
    out = (torch.stack(sampled, dim=-2).flatten(-2) * w_).sum(-1)
    return out.view(bs, heads * hd, nq).transpose(1, 2)


def test_deformable_attention_matches_grid_sample():
    rs = np.random.RandomState(0)
    b, heads, hd, points = 2, 2, 4, 3
    d = heads * hd
    shapes = [(4, 6), (2, 3)]
    n_val = sum(h * w for h, w in shapes)
    nq = 5
    levels = len(shapes)

    query = rs.randn(b, nq, d).astype(np.float32)
    value = rs.randn(b, n_val, d).astype(np.float32)
    # reference points spread over [0,1]² incl. near-border
    ref = rs.rand(b, nq, 2).astype(np.float32)

    p = {
        "value_proj": {"w": rs.randn(d, d).astype(np.float32) * 0.2,
                       "b": rs.randn(d).astype(np.float32) * 0.1},
        "sampling_offsets": {
            "w": rs.randn(d, heads * levels * points * 2).astype(np.float32) * 2.0,
            "b": rs.randn(heads * levels * points * 2).astype(np.float32) * 2.0,
        },
        "attn_weights": {
            "w": rs.randn(d, heads * levels * points).astype(np.float32) * 0.3,
            "b": np.zeros(heads * levels * points, np.float32),
        },
        "out_proj": {"w": rs.randn(d, d).astype(np.float32) * 0.2,
                     "b": rs.randn(d).astype(np.float32) * 0.1},
    }
    jp = jax.tree.map(jnp.asarray, p)

    got = np.asarray(
        gdino_lib.deformable_attention(
            jp, jnp.asarray(query), jnp.asarray(ref), jnp.asarray(value),
            shapes, heads, points,
        )
    )

    # torch mirror with the same linears (large offset weights push many
    # samples out of bounds → exercises the zeros-padding border path)
    qt = torch.from_numpy(query)
    vt = torch.from_numpy(value)
    v_proj = (vt @ torch.from_numpy(p["value_proj"]["w"])
              + torch.from_numpy(p["value_proj"]["b"]))
    v_proj = v_proj.view(b, n_val, heads, hd)
    offs = (qt @ torch.from_numpy(p["sampling_offsets"]["w"])
            + torch.from_numpy(p["sampling_offsets"]["b"]))
    offs = offs.view(b, nq, heads, levels, points, 2)
    wts = (qt @ torch.from_numpy(p["attn_weights"]["w"])
           + torch.from_numpy(p["attn_weights"]["b"]))
    wts = wts.view(b, nq, heads, levels * points).softmax(-1)
    wts = wts.view(b, nq, heads, levels, points)
    normalizer = torch.tensor([[w, h] for h, w in shapes], dtype=torch.float32)
    locs = (torch.from_numpy(ref)[:, :, None, None, None, :]
            + offs / normalizer[None, None, None, :, None, :])
    core = t_ms_deform_attn_core(v_proj, shapes, locs, wts)
    ref_out = (core @ torch.from_numpy(p["out_proj"]["w"])
               + torch.from_numpy(p["out_proj"]["b"])).numpy()

    np.testing.assert_allclose(got, ref_out, atol=3e-5, rtol=1e-4)


def test_deformable_attention_box_refpoints():
    """4-d reference points: offsets scale by box size / (2·points)."""
    rs = np.random.RandomState(1)
    b, heads, hd, points = 1, 2, 4, 2
    d = heads * hd
    shapes = [(3, 3)]
    nq = 4
    query = rs.randn(b, nq, d).astype(np.float32)
    value = rs.randn(b, 9, d).astype(np.float32)
    ref4 = np.concatenate(
        [rs.rand(b, nq, 2), 0.2 + 0.5 * rs.rand(b, nq, 2)], axis=-1
    ).astype(np.float32)
    p = {
        "value_proj": {"w": np.eye(d, dtype=np.float32), "b": np.zeros(d, np.float32)},
        "sampling_offsets": {"w": rs.randn(d, heads * points * 2).astype(np.float32),
                             "b": np.zeros(heads * points * 2, np.float32)},
        "attn_weights": {"w": rs.randn(d, heads * points).astype(np.float32) * 0.3,
                         "b": np.zeros(heads * points, np.float32)},
        "out_proj": {"w": np.eye(d, dtype=np.float32), "b": np.zeros(d, np.float32)},
    }
    jp = jax.tree.map(jnp.asarray, p)
    got = np.asarray(
        gdino_lib.deformable_attention(
            jp, jnp.asarray(query), jnp.asarray(ref4), jnp.asarray(value),
            shapes, heads, points,
        )
    )
    qt = torch.from_numpy(query)
    v_proj = torch.from_numpy(value).view(b, 9, heads, hd)
    offs = (qt @ torch.from_numpy(p["sampling_offsets"]["w"])).view(
        b, nq, heads, 1, points, 2
    )
    wts = (qt @ torch.from_numpy(p["attn_weights"]["w"])).view(
        b, nq, heads, points
    ).softmax(-1).view(b, nq, heads, 1, points)
    r = torch.from_numpy(ref4)
    locs = (r[:, :, None, None, None, :2]
            + offs / points * r[:, :, None, None, None, 2:] * 0.5)
    ref_out = t_ms_deform_attn_core(v_proj, shapes, locs, wts).numpy()
    np.testing.assert_allclose(got, ref_out, atol=3e-5, rtol=1e-4)


def test_fusion_biattention_torch_golden_parity():
    """BiAttentionBlock golden parity: hand-built torch module per the
    official GroundingDINO/GLIP BiMultiHeadAttention (shared image-text
    logits, per-direction softmax, ±50000 clamps, text-direction row-max
    stabilization, layer-scale gammas) vs `gdino._bi_attention`."""
    import pytest
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    import jax.numpy as jnp

    from instructany2pix_tpu.grounding import gdino as G
    from instructany2pix_tpu.core.prng import KeyChain

    d, heads, nv, nl, b = 32, 4, 10, 7, 2
    hd = d // heads

    class BiMHA(nn.Module):
        def __init__(self):
            super().__init__()
            self.v_proj = nn.Linear(d, d)
            self.l_proj = nn.Linear(d, d)
            self.values_v_proj = nn.Linear(d, d)
            self.values_l_proj = nn.Linear(d, d)
            self.out_v_proj = nn.Linear(d, d)
            self.out_l_proj = nn.Linear(d, d)
            self.scale = hd ** -0.5

        def _shape(self, t, n):
            return t.view(b, n, heads, hd).transpose(1, 2).reshape(b * heads, n, hd)

        def forward(self, v, l, attention_mask_l=None):
            q = self._shape(self.v_proj(v) * self.scale, nv)
            k = self._shape(self.l_proj(l), nl)
            vv = self._shape(self.values_v_proj(v), nv)
            vl = self._shape(self.values_l_proj(l), nl)
            w = torch.bmm(q, k.transpose(1, 2))  # (b*h, nv, nl)
            w = torch.clamp(w, min=-50000, max=50000)
            wT = w.transpose(1, 2)
            wl = wT - wT.max(dim=-1, keepdim=True)[0]
            wl = torch.clamp(wl, min=-50000, max=50000)
            attn_l = wl.softmax(dim=-1)
            if attention_mask_l is not None:
                m = attention_mask_l[:, None, None, :].repeat(1, heads, 1, 1)
                w = w.view(b, heads, nv, nl).masked_fill(~m, float("-inf"))
                w = w.view(b * heads, nv, nl)
            attn_v = w.softmax(dim=-1)
            out_v = torch.bmm(attn_v, vl)
            out_l = torch.bmm(attn_l, vv)
            out_v = out_v.view(b, heads, nv, hd).transpose(1, 2).reshape(b, nv, d)
            out_l = out_l.view(b, heads, nl, hd).transpose(1, 2).reshape(b, nl, d)
            return self.out_v_proj(out_v), self.out_l_proj(out_l)

    class BiBlock(nn.Module):
        def __init__(self):
            super().__init__()
            self.layer_norm_v = nn.LayerNorm(d)
            self.layer_norm_l = nn.LayerNorm(d)
            self.attn = BiMHA()
            self.gamma_v = nn.Parameter(torch.full((d,), 1e-4))
            self.gamma_l = nn.Parameter(torch.full((d,), 1e-4))

        def forward(self, v, l, mask_l):
            dv, dl = self.attn(self.layer_norm_v(v), self.layer_norm_l(l), mask_l)
            return v + self.gamma_v * dv, l + self.gamma_l * dl

    tm = BiBlock().eval()
    with torch.no_grad():
        tm.gamma_v.copy_(torch.randn(d) * 0.1)
        tm.gamma_l.copy_(torch.randn(d) * 0.1)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    def lin(name):
        return {"w": np.ascontiguousarray(sd[f"{name}.weight"].T),
                "b": sd[f"{name}.bias"]}

    p = {
        "ln_v": {"g": sd["layer_norm_v.weight"], "b": sd["layer_norm_v.bias"]},
        "ln_l": {"g": sd["layer_norm_l.weight"], "b": sd["layer_norm_l.bias"]},
        "v_proj": lin("attn.v_proj"),
        "l_proj": lin("attn.l_proj"),
        "values_v_proj": lin("attn.values_v_proj"),
        "values_l_proj": lin("attn.values_l_proj"),
        "out_v_proj": lin("attn.out_v_proj"),
        "out_l_proj": lin("attn.out_l_proj"),
        "gamma_v": sd["gamma_v"],
        "gamma_l": sd["gamma_l"],
    }
    p = {k: ({kk: jnp.asarray(vv) for kk, vv in v.items()} if isinstance(v, dict)
             else jnp.asarray(v)) for k, v in p.items()}

    rs = np.random.RandomState(0)
    img = rs.randn(b, nv, d).astype(np.float32)
    txt = rs.randn(b, nl, d).astype(np.float32)
    mask = np.ones((b, nl), bool)
    mask[1, 5:] = False  # padded text tokens on row 1

    with torch.no_grad():
        tv, tl = tm(torch.from_numpy(img), torch.from_numpy(txt),
                    torch.from_numpy(mask))
    jv, jl = G._bi_attention(p, jnp.asarray(img), jnp.asarray(txt), heads,
                             jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(jv), tv.numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(jl), tl.numpy(), atol=2e-5, rtol=1e-4)


def test_decoder_layer_torch_golden_parity():
    """Full decoder-layer glue golden parity: torch modules per the
    official DeformableTransformerDecoderLayer (self-attn with pos
    queries → text cross-attn with pos → deformable image cross-attn
    with pos and box reference points → FFN → iterative box refinement)
    vs `gdino._dec_layer`. Catches ordering/pos/norm-placement bugs the
    primitive-level tests can't (this hunt FOUND the missing pos on the
    deformable query)."""
    import torch.nn as nn

    d, heads, points = 16, 2, 2
    shapes = [(4, 4), (2, 2)]
    levels = len(shapes)
    nv = sum(h * w for h, w in shapes)
    b, nq, nl = 2, 3, 5
    hd = d // heads
    ffn = 32

    torch.manual_seed(0)
    self_attn = nn.MultiheadAttention(d, heads, batch_first=True).eval()
    ca_text = nn.MultiheadAttention(d, heads, batch_first=True).eval()
    value_proj = nn.Linear(d, d)
    sampling_offsets = nn.Linear(d, heads * levels * points * 2)
    attention_weights = nn.Linear(d, heads * levels * points)
    output_proj = nn.Linear(d, d)
    lin1, lin2 = nn.Linear(d, ffn), nn.Linear(ffn, d)
    norm1, norm2, norm3, catext_norm = (nn.LayerNorm(d) for _ in range(4))
    box_mlp = nn.Sequential(nn.Linear(d, d), nn.ReLU(), nn.Linear(d, d),
                            nn.ReLU(), nn.Linear(d, 4))

    rs = np.random.RandomState(1)
    tgt = torch.from_numpy(rs.randn(b, nq, d).astype(np.float32))
    pos = torch.from_numpy(rs.randn(b, nq, d).astype(np.float32))
    txt = torch.from_numpy(rs.randn(b, nl, d).astype(np.float32))
    img = torch.from_numpy(rs.randn(b, nv, d).astype(np.float32))
    boxes = torch.from_numpy(
        (0.2 + 0.6 * rs.rand(b, nq, 4)).astype(np.float32))
    valid = np.ones((b, nl), bool); valid[1, 3:] = False

    def inverse_sigmoid(x, eps=1e-5):
        x = x.clamp(0, 1)
        return torch.log(x.clamp(min=eps) / (1 - x).clamp(min=eps))

    with torch.no_grad():
        qp = tgt + pos
        t2 = self_attn(qp, qp, tgt, need_weights=False)[0]
        out = norm2(tgt + t2)
        t2 = ca_text(out + pos, txt, txt,
                     key_padding_mask=torch.from_numpy(~valid),
                     need_weights=False)[0]
        out = catext_norm(out + t2)
        q_c = out + pos
        v = value_proj(img).view(b, nv, heads, hd)
        offs = sampling_offsets(q_c).view(b, nq, heads, levels, points, 2)
        wts = attention_weights(q_c).view(b, nq, heads, levels * points)
        wts = wts.softmax(-1).view(b, nq, heads, levels, points)
        locs = (boxes[:, :, None, None, None, :2]
                + offs / points * boxes[:, :, None, None, None, 2:] * 0.5)
        core = t_ms_deform_attn_core(v, shapes, locs, wts)
        out = norm1(out + output_proj(core))
        out = norm3(out + lin2(torch.relu(lin1(out))))
        want_boxes = torch.sigmoid(inverse_sigmoid(boxes) + box_mlp(out))
    want_q = out.numpy()

    # ---- map weights into our param layout
    def lin_t(m):
        return {"w": np.ascontiguousarray(m.weight.detach().numpy().T),
                "b": m.bias.detach().numpy()}

    def mha_t(m):
        W = m.in_proj_weight.detach().numpy()
        B = m.in_proj_bias.detach().numpy()
        return {
            "q": {"w": np.ascontiguousarray(W[:d].T), "b": B[:d]},
            "k": {"w": np.ascontiguousarray(W[d:2*d].T), "b": B[d:2*d]},
            "v": {"w": np.ascontiguousarray(W[2*d:].T), "b": B[2*d:]},
            "o": lin_t(m.out_proj),
        }

    def ln_t(m):
        return {"g": m.weight.detach().numpy(), "b": m.bias.detach().numpy()}

    p = {
        "self_attn": mha_t(self_attn),
        "ln1": ln_t(norm2),  # our ln1 = official norm2 (after self-attn)
        "txt_cross": mha_t(ca_text),
        "ln2": ln_t(catext_norm),
        "img_deform": {
            "value_proj": lin_t(value_proj),
            "sampling_offsets": lin_t(sampling_offsets),
            "attn_weights": lin_t(attention_weights),
            "out_proj": lin_t(output_proj),
        },
        "ln3": ln_t(norm1),  # official norm1 (after deformable cross)
        "ffn": {"fc1": lin_t(lin1), "fc2": lin_t(lin2), "ln": ln_t(norm3)},
        "box_mlp": {"fc0": lin_t(box_mlp[0]), "fc1": lin_t(box_mlp[2]),
                    "fc2": lin_t(box_mlp[4])},
    }
    jp = jax.tree.map(jnp.asarray, p)
    got_q, got_boxes = gdino_lib._dec_layer(
        jp, jnp.asarray(tgt.numpy()), jnp.asarray(boxes.numpy()),
        jnp.asarray(txt.numpy()), jnp.asarray(img.numpy()), shapes, heads,
        points, jnp.asarray(valid), jnp.asarray(pos.numpy()),
    )
    np.testing.assert_allclose(np.asarray(got_q), want_q, atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(got_boxes), want_boxes.numpy(), atol=3e-5, rtol=1e-4)


def test_encoder_layer_torch_golden_parity():
    """Encoder-layer glue golden parity: official
    DeformableTransformerEncoderLayer (deformable self-attn with
    with_pos_embed query + per-token grid reference points, norm after
    residual, FFN with post-norm) and the text enhancer layer (MHA with
    sine pos on q/k, key_padding_mask) vs the encoder loop body in
    `gdino.forward`."""
    import torch.nn as nn

    d, heads, points = 16, 2, 2
    shapes = [(4, 4), (2, 2)]
    levels = len(shapes)
    nv = sum(h * w for h, w in shapes)
    b, nl, ffn = 2, 5, 32

    torch.manual_seed(1)
    value_proj = nn.Linear(d, d)
    sampling_offsets = nn.Linear(d, heads * levels * points * 2)
    attention_weights = nn.Linear(d, heads * levels * points)
    output_proj = nn.Linear(d, d)
    norm1 = nn.LayerNorm(d)
    lin1, lin2 = nn.Linear(d, ffn), nn.Linear(ffn, d)
    norm2 = nn.LayerNorm(d)
    t_attn = nn.MultiheadAttention(d, heads, batch_first=True).eval()
    t_norm1 = nn.LayerNorm(d)
    t_lin1, t_lin2 = nn.Linear(d, ffn // 2), nn.Linear(ffn // 2, d)
    t_norm2 = nn.LayerNorm(d)

    rs = np.random.RandomState(6)
    img = torch.from_numpy(rs.randn(b, nv, d).astype(np.float32))
    img_pos = torch.from_numpy(rs.randn(1, nv, d).astype(np.float32))
    txt = torch.from_numpy(rs.randn(b, nl, d).astype(np.float32))
    txt_pos = torch.from_numpy(rs.randn(1, nl, d).astype(np.float32))
    valid = np.ones((b, nl), bool); valid[0, 4:] = False

    # per-token grid-center reference points (what gdino.forward builds)
    refs = []
    for h, w in shapes:
        ys = (np.arange(h) + 0.5) / h
        xs = (np.arange(w) + 0.5) / w
        gx, gy = np.meshgrid(xs, ys)
        refs.append(np.stack([gx, gy], -1).reshape(-1, 2))
    ref = torch.from_numpy(
        np.tile(np.concatenate(refs, 0)[None], (b, 1, 1)).astype(np.float32))

    with torch.no_grad():
        q_c = img + img_pos
        v = value_proj(img).view(b, nv, heads, d // heads)
        offs = sampling_offsets(q_c).view(b, nv, heads, levels, points, 2)
        wts = attention_weights(q_c).view(b, nv, heads, levels * points)
        wts = wts.softmax(-1).view(b, nv, heads, levels, points)
        normalizer = torch.tensor([[w, h] for h, w in shapes], dtype=torch.float32)
        locs = ref[:, :, None, None, None, :] + offs / normalizer[None, None, None, :, None, :]
        core = t_ms_deform_attn_core(v, shapes, locs, wts)
        src = norm1(img + output_proj(core))
        src = norm2(src + lin2(torch.relu(lin1(src))))
        tq = txt + txt_pos
        t2 = t_attn(tq, tq, txt, key_padding_mask=torch.from_numpy(~valid),
                    need_weights=False)[0]
        out_t = t_norm1(txt + t2)
        out_t = t_norm2(out_t + t_lin2(torch.relu(t_lin1(out_t))))

    def lin_t(m):
        return {"w": np.ascontiguousarray(m.weight.detach().numpy().T),
                "b": m.bias.detach().numpy()}

    def ln_t(m):
        return {"g": m.weight.detach().numpy(), "b": m.bias.detach().numpy()}

    W = t_attn.in_proj_weight.detach().numpy()
    B = t_attn.in_proj_bias.detach().numpy()
    p = jax.tree.map(jnp.asarray, {
        "img_deform": {
            "value_proj": lin_t(value_proj),
            "sampling_offsets": lin_t(sampling_offsets),
            "attn_weights": lin_t(attention_weights),
            "out_proj": lin_t(output_proj),
        },
        "img_ln": ln_t(norm1),
        "img_ffn": {"fc1": lin_t(lin1), "fc2": lin_t(lin2), "ln": ln_t(norm2)},
        "txt_attn": {
            "q": {"w": np.ascontiguousarray(W[:d].T), "b": B[:d]},
            "k": {"w": np.ascontiguousarray(W[d:2*d].T), "b": B[d:2*d]},
            "v": {"w": np.ascontiguousarray(W[2*d:].T), "b": B[2*d:]},
            "o": lin_t(t_attn.out_proj),
        },
        "txt_ln": ln_t(t_norm1),
        "txt_ffn": {"fc1": lin_t(t_lin1), "fc2": lin_t(t_lin2), "ln": ln_t(t_norm2)},
    })

    # our encoder body (gdino.forward lines: deformable self-attn then
    # _ffn; text mha then _ffn)
    from instructany2pix_tpu.grounding.gdino import _ffn, _mha, deformable_attention
    import instructany2pix_tpu.models.layers as L

    img_j = jnp.asarray(img.numpy())
    got_img = L.layer_norm(
        p["img_ln"],
        img_j + deformable_attention(
            p["img_deform"], img_j + jnp.asarray(img_pos.numpy()),
            jnp.asarray(ref.numpy()), img_j, shapes, heads, points,
        ),
    )
    got_img = _ffn(p["img_ffn"], got_img)
    txt_j = jnp.asarray(txt.numpy())
    tq_j = txt_j + jnp.asarray(txt_pos.numpy())
    got_txt = L.layer_norm(
        p["txt_ln"], txt_j + _mha(p["txt_attn"], tq_j, tq_j, txt_j, heads,
                                  mask=jnp.asarray(valid)))
    got_txt = _ffn(p["txt_ffn"], got_txt)

    np.testing.assert_allclose(np.asarray(got_img), src.numpy(), atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_txt), out_t.numpy(), atol=3e-5, rtol=1e-4)


def test_swin_block_nondivisible_torch_golden_parity():
    """Swin block golden parity at a NON-window-divisible resolution
    (the 800px GDINO case: every stage needs padding) incl. a shifted
    block — validates the official pad-THEN-roll order, the padded-canvas
    shift mask, relative position bias indexing, and the unroll-then-crop
    exit. (This hunt FIXED a roll-before-pad ordering bug.)"""
    import torch.nn as nn

    d, heads, window, shift = 16, 2, 7, 3
    H, W, b = 10, 13, 2
    hd = d // heads

    class TWinAttn(nn.Module):
        def __init__(self):
            super().__init__()
            self.qkv = nn.Linear(d, 3 * d)
            self.proj = nn.Linear(d, d)
            self.bias_table = nn.Parameter(
                torch.randn((2 * window - 1) ** 2, heads) * 0.1)
            coords = torch.stack(torch.meshgrid(
                torch.arange(window), torch.arange(window), indexing="ij"))
            flat = torch.flatten(coords, 1)
            rel = flat[:, :, None] - flat[:, None, :]
            rel = rel.permute(1, 2, 0).contiguous()
            rel[:, :, 0] += window - 1
            rel[:, :, 1] += window - 1
            rel[:, :, 0] *= 2 * window - 1
            self.register_buffer("rel_idx", rel.sum(-1))

        def forward(self, xw, mask):
            nb, n, _ = xw.shape
            qkv = self.qkv(xw).reshape(nb, n, 3, heads, hd).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = (q * hd ** -0.5) @ k.transpose(-2, -1)
            bias = self.bias_table[self.rel_idx.view(-1)].view(n, n, heads)
            attn = attn + bias.permute(2, 0, 1)[None]
            if mask is not None:
                nw = mask.shape[0]
                attn = attn.view(nb // nw, nw, heads, n, n) + mask[None, :, None]
                attn = attn.view(nb, heads, n, n)
            attn = attn.softmax(dim=-1)
            return self.proj((attn @ v).transpose(1, 2).reshape(nb, n, d))

    def t_window_partition(x, w):
        B, Hp, Wp, C = x.shape
        x = x.view(B, Hp // w, w, Wp // w, w, C)
        return x.permute(0, 1, 3, 2, 4, 5).contiguous().view(-1, w * w, C)

    class TBlock(nn.Module):
        def __init__(self, s):
            super().__init__()
            self.s = s
            self.norm1 = nn.LayerNorm(d)
            self.attn = TWinAttn()
            self.norm2 = nn.LayerNorm(d)
            self.fc1, self.fc2 = nn.Linear(d, 2 * d), nn.Linear(2 * d, d)

        def forward(self, x):
            B = x.shape[0]
            shortcut = x
            y = self.norm1(x)
            pad_h = (window - H % window) % window
            pad_w = (window - W % window) % window
            y = torch.nn.functional.pad(y, (0, 0, 0, pad_w, 0, pad_h))
            Hp, Wp = H + pad_h, W + pad_w
            mask = None
            if self.s:
                y = torch.roll(y, (-self.s, -self.s), dims=(1, 2))
                img_mask = torch.zeros(1, Hp, Wp, 1)
                cnt = 0
                for hs in (slice(0, -window), slice(-window, -self.s), slice(-self.s, None)):
                    for ws in (slice(0, -window), slice(-window, -self.s), slice(-self.s, None)):
                        img_mask[:, hs, ws, :] = cnt
                        cnt += 1
                mw = t_window_partition(img_mask, window).view(-1, window * window)
                mask = mw[:, None] - mw[:, :, None]
                mask = mask.masked_fill(mask != 0, -100.0).masked_fill(mask == 0, 0.0)
            yw = t_window_partition(y, window)
            o = self.attn(yw, mask)
            o = o.view(-1, Hp // window, Wp // window, window, window, d)
            o = o.permute(0, 1, 3, 2, 4, 5).contiguous().view(B, Hp, Wp, d)
            if self.s:
                o = torch.roll(o, (self.s, self.s), dims=(1, 2))
            o = o[:, :H, :W]
            x = shortcut + o
            return x + self.fc2(torch.nn.functional.gelu(self.fc1(self.norm2(x))))

    from instructany2pix_tpu.grounding import swin as SW
    import instructany2pix_tpu.models.layers as L

    rel_idx = SW._rel_index(window)
    rs = np.random.RandomState(8)
    x = rs.randn(b, H, W, d).astype(np.float32)

    for s in (0, shift):
        torch.manual_seed(10 + s)
        tb = TBlock(s).eval()
        with torch.no_grad():
            want = tb(torch.from_numpy(x)).numpy()

        def lin_t(m):
            return {"w": np.ascontiguousarray(m.weight.detach().numpy().T),
                    "b": m.bias.detach().numpy()}

        p = jax.tree.map(jnp.asarray, {
            "ln1": {"g": tb.norm1.weight.detach().numpy(), "b": tb.norm1.bias.detach().numpy()},
            "qkv": lin_t(tb.attn.qkv),
            "proj": lin_t(tb.attn.proj),
            "rel_bias": tb.attn.bias_table.detach().numpy(),
            "ln2": {"g": tb.norm2.weight.detach().numpy(), "b": tb.norm2.bias.detach().numpy()},
            "fc1": lin_t(tb.fc1),
            "fc2": lin_t(tb.fc2),
        })
        xj = jnp.asarray(x)
        hh = L.layer_norm(p["ln1"], xj)
        h = xj + SW._window_attn(p, hh, heads, window, s, rel_idx)
        hh = L.layer_norm(p["ln2"], h)
        got = h + L.linear(p["fc2"], L.gelu(L.linear(p["fc1"], hh)))
        np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=1e-4,
                                   err_msg=f"shift={s}")
