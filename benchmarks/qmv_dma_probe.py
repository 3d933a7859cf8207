"""Decode-matvec DMA-efficiency probe (VERDICT r4 item 4, lever 1).

The production qmv kernel streams weight blocks via the pallas grid
(double-buffered by Mosaic) and lands at ~82% of the packed-bytes
floor (decode_attrib, BASELINE.md r4). Hypothesis: a single in-flight
DMA per step under-subscribes the HBM controller; N>=3 manually rotated
buffers with up to N-1 outstanding copies may close the gap.

This probe implements the int4-grouped chain-dot matvec with a manual
multi-slot async-copy pipeline (grid=1, weights in ANY/HBM space) and
A/Bs it against the production `pallas_qmatmul` at the four 7B decode
shapes. Run alone on the real chip:  python benchmarks/qmv_dma_probe.py
"""

import functools
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from benchmarks.timing import bench_loop
from instructany2pix_tpu.ops import quant as Q

SHAPES = [(4096, 12288), (4096, 4096), (4096, 11008), (11008, 4096)]


def _manual_kernel(x_ref, w_hbm, s_ref, o_ref, *, nbuf, bn, group):
    kp, n = w_hbm.shape  # packed rows (K/2), full N
    nblk = n // bn

    def body(scratch, sems):
        def dma(slot, i):
            return pltpu.make_async_copy(
                w_hbm.at[:, pl.ds(i * bn, bn)], scratch.at[slot], sems.at[slot]
            )

        for w in range(nbuf - 1):
            if w < nblk:  # static
                dma(w, w).start()

        x = x_ref[:]

        def loop(i, _):
            slot = jax.lax.rem(i, nbuf)

            @pl.when(i + nbuf - 1 < nblk)
            def _():
                # keep nbuf-1 copies in flight
                pltpu.make_async_copy(
                    w_hbm.at[:, pl.ds((i + nbuf - 1) * bn, bn)],
                    scratch.at[jax.lax.rem(i + nbuf - 1, nbuf)],
                    sems.at[jax.lax.rem(i + nbuf - 1, nbuf)],
                ).start()

            pltpu.make_async_copy(
                w_hbm.at[:, pl.ds(i * bn, bn)], scratch.at[slot], sems.at[slot]
            ).wait()
            wq = pltpu.bitcast(scratch[slot], jnp.int4)  # (K, bn) orig order
            wd = wq.astype(x.dtype)
            g_count = s_ref.shape[0]
            # ref-level dynamic load (pl.ds) — a dynamic_slice on the
            # VALUE s_ref[:] has no Pallas TPU lowering on this toolchain
            sblk = s_ref[:, pl.ds(i * bn, bn)]  # (G, bn)
            acc = jnp.zeros((x.shape[0], bn), jnp.float32)
            for g in range(g_count):
                part = jnp.dot(
                    x[:, g * group:(g + 1) * group],
                    wd[g * group:(g + 1) * group],
                    preferred_element_type=jnp.float32,
                )
                acc = acc + part * sblk[g][None]
            o_ref[:, pl.ds(i * bn, bn)] = acc.astype(o_ref.dtype)
            return _

        jax.lax.fori_loop(0, nblk, loop, None)

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((nbuf, kp, bn), jnp.int8),
        sems=pltpu.SemaphoreType.DMA((nbuf,)),
    )


def manual_qmv(x, q, nbuf=3, bn=512):
    w = q["w_q4"]
    k2, n = w.shape
    k = 2 * k2
    gs = q["gscale"].astype(jnp.float32)
    group = k // gs.shape[0]
    m = x.shape[0]
    x = x.astype(jnp.float32)
    return pl.pallas_call(
        functools.partial(_manual_kernel, nbuf=nbuf, bn=bn, group=group),
        in_specs=[
            pl.BlockSpec((m, k), lambda: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((gs.shape[0], n), lambda: (0, 0)),
        ],
        out_specs=pl.BlockSpec((m, n), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
    )(x, w, gs)


def main():
    rs = np.random.RandomState(0)
    for K, N in SHAPES:
        w = jnp.asarray(rs.randn(K, N).astype(np.float32) * 0.02)
        x = jnp.asarray(rs.randn(1, K).astype(np.float32))
        qz = Q.quantize_weight_int4_grouped(w)
        floor = K * N / 2 / 819e9 * 1e6
        ref = np.asarray(Q.pallas_qmatmul(x, qz))
        t0 = bench_loop(lambda x, qq: Q.pallas_qmatmul(x, qq), (x, qz), iters=1000)
        print(f"{K}x{N} prod grid kernel: {t0*1e6:6.1f}us "
              f"({t0*1e6/floor:.2f}x floor)", flush=True)
        for nbuf in (2, 3, 4):
            for bn in (256, 512):
                if N % bn:
                    continue
                try:
                    got = np.asarray(manual_qmv(x, qz, nbuf=nbuf, bn=bn))
                    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
                    assert err < 2e-2, err
                    t = bench_loop(
                        lambda x, qq, nb=nbuf, b=bn: manual_qmv(x, qq, nb, b),
                        (x, qz), iters=1000,
                    )
                    print(f"    manual nbuf={nbuf} bn={bn}: {t*1e6:6.1f}us "
                          f"({t*1e6/floor:.2f}x floor, err {err:.1e})",
                          flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"    manual nbuf={nbuf} bn={bn}: FAILED "
                          f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
