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
