"""StagedParams: budgeted LRU weight staging for single-chip deployment.

The one-chip counterpart of the reference's single-GPU memory squeeze
(reference pipeline.py:30,101 — NF4 LLM + fp16 diffusion sharing one
device): groups materialize on access, evict LRU under a byte budget,
and re-materialize from the host cache without re-running the factory
(i.e. without re-quantizing / re-loading the checkpoint)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instructany2pix_tpu.core.staging import StagedParams, tree_device_bytes


def _mk(value, shape=(64, 64)):
    calls = {"n": 0}

    def factory():
        calls["n"] += 1
        return {"w": jnp.full(shape, float(value), jnp.float32)}

    return factory, calls


def test_materialize_and_lru_eviction():
    fa, ca = _mk(1.0)
    fb, cb = _mk(2.0)
    fc, cc = _mk(3.0)
    one = 64 * 64 * 4
    store = StagedParams(
        {"a": fa, "b": fb, "c": fc}, budget_bytes=2 * one + 1
    )
    assert float(store["a"]["w"][0, 0]) == 1.0
    assert float(store["b"]["w"][0, 0]) == 2.0
    assert set(store.live_groups()) == {"a", "b"}
    # touching a makes b the LRU victim when c loads
    store["a"]
    store["c"]
    assert set(store.live_groups()) == {"a", "c"}
    assert store.stats["evictions"] == ["b"]
    # b re-materializes from the host cache: factory NOT re-run
    assert float(store["b"]["w"][0, 0]) == 2.0
    assert cb["n"] == 1
    assert store.stats["swaps"] == 1
    assert store.stats["swap_s"] >= 0.0
    assert ca["n"] == 1 and cc["n"] == 1


def test_alias_and_pin():
    fa, ca = _mk(1.0)
    fb, _ = _mk(2.0)
    one = 64 * 64 * 4
    store = StagedParams(
        {"a": fa, "b": fb},
        budget_bytes=one + 1,
        aliases={"a2": "a"},
        pin=("a",),
    )
    assert store["a2"]["w"] is store["a"]["w"]
    assert ca["n"] == 1  # alias resolved to the same group
    store["b"]  # would evict a, but a is pinned -> b over budget, a stays
    assert "a" in store.live_groups()
    assert "a2" in store and "a" in store


def test_setitem_replaces_group():
    fa, _ = _mk(1.0)
    store = StagedParams({"a": fa}, budget_bytes=1e9)
    store["a"]
    store["a"] = {"w": jnp.zeros((8, 8))}
    assert float(jnp.sum(store["a"]["w"])) == 0.0
    assert store.live_groups()["a"] == 8 * 8 * 4


def test_oversized_group_still_materializes():
    fa, _ = _mk(1.0)
    store = StagedParams({"a": fa}, budget_bytes=16)  # smaller than a
    assert float(store["a"]["w"][0, 0]) == 1.0


def test_tree_device_bytes():
    t = {"a": jnp.zeros((4, 4), jnp.bfloat16), "b": jnp.zeros((2,), jnp.int8)}
    assert tree_device_bytes(t) == 4 * 4 * 2 + 2


@pytest.mark.slow
def test_pipeline_with_staged_params_matches_dict(tmp_path):
    """A tiny pipeline over a StagedParams store with a budget that
    forces mid-edit staging swaps produces the SAME edit as the plain
    dict-params pipeline (same seed) — staging is a memory-layout
    concern, never a numerics one."""
    from PIL import Image

    from instructany2pix_tpu.pipeline import InstructAny2PixPipeline

    ref = InstructAny2PixPipeline(tiny=True, seed=0)

    groups = dict(ref.params)
    inpaint = groups.pop("inpaint_unet")
    assert inpaint is not groups["unet"]  # tiny init: separate 9-ch unet
    factories = {k: (lambda v=v: v) for k, v in groups.items()}
    factories["inpaint_unet"] = lambda: inpaint
    # budget = 2 KB forces constant swapping between stages
    store = StagedParams(factories, budget_bytes=2048)
    staged = InstructAny2PixPipeline(
        tiny=True, seed=0, config=ref.cfg, params=store
    )

    img_path = tmp_path / "img.png"
    rs = np.random.RandomState(0)
    Image.fromarray(rs.randint(0, 255, (80, 96, 3), np.uint8)).save(img_path)
    media = [{"type": "image", "fname": str(img_path)}]

    a1, b1, m1 = ref("edit <video>", media, num_inference_steps=2, seed=7)
    ref.cache = None
    a2, b2, m2 = staged("edit <video>", media, num_inference_steps=2, seed=7)
    assert m1 == m2
    if a1 is None:
        assert a2 is None  # caption-only outcome must match too
    else:
        np.testing.assert_array_equal(a1, a2)
        np.testing.assert_array_equal(b1, b2)
    assert len(store.stats["evictions"]) > 0  # staging actually happened


def test_planned_mode_swap_accounting():
    """The bench's `planned` staging policy at proxy scale (KB ≈ GB,
    bench.py `bench_wallclock` mode="planned"): the small groups + UNet
    are pinned, so across a warm edit only the LLM and the refiner
    rotate — exactly 2 swaps whose bytes are llm+refiner, i.e. the
    ≤9 GB/edit claim (VERDICT r4 item 2a) as deterministic accounting
    rather than a tunnel measurement."""
    # bench_wallclock's group inventory, proxy-scaled: 1 KB ≈ 1 GB
    gb = 256  # floats per "GB" (×4 bytes = 1 KB)
    sizes = {
        "llm": 3.8, "imagebind_vision": 1.3, "imagebind_audio": 0.2,
        "text1": 0.3, "text2": 1.4, "prior_text": 0.3, "prior": 2.0,
        "vae": 0.2, "image_proj": 0.1, "unet": 5.8, "refiner": 4.5,
    }
    factories = {
        k: (lambda v=v: {"w": jnp.ones((int(v * gb),), jnp.float32)})
        for k, v in sizes.items()
    }
    pins = tuple(k for k in sizes if k not in ("llm", "refiner"))
    budget = int(15.0 * gb * 4)  # peak live = pinned 11.6 + max(llm, refiner)
    store = StagedParams(factories, budget_bytes=budget, pin=pins)

    # one edit's group-access order (pipeline.__call__; see the
    # params["..."] sequence in pipeline.py)
    edit = [
        "imagebind_vision", "imagebind_audio", "llm", "text1", "text2",
        "prior_text", "prior", "vae", "unet", "image_proj", "unet",
        "vae", "text2", "vae", "refiner", "vae",
    ]
    for name in edit:  # cold edit: first materialization of everything
        store[name]
    s0 = dict(store.stats)
    for name in edit:  # warm edit
        store[name]
    nswaps = store.stats["swaps"] - s0["swaps"]
    swap_b = store.stats["swap_bytes"] - s0["swap_bytes"]
    assert nswaps == 2, store.stats["evictions"]
    per_edit_gb = swap_b / (gb * 4)
    assert abs(per_edit_gb - (sizes["llm"] + sizes["refiner"])) < 0.01
    assert per_edit_gb <= 9.0
    # pinned groups never appear in the eviction log
    assert set(store.stats["evictions"]) <= {"llm", "refiner"}
