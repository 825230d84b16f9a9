"""Minimal in-context repro for the lanes=512 Pallas desync (VERDICT r3
item 3).

Builds ONE jitted program that reproduces the latency codec's fused
decode context (z decode -> h_s -> context/rows) and then decodes the
SAME traced rows twice — once with the XLA scan, once with the Mosaic
kernel. Any disagreement is then provably a kernel-in-context effect on
bit-identical inputs (layout/aliasing at the custom-call boundary), not
an upstream float divergence.

Stages:
  A. scan-vs-pallas on identical traced rows inside the fused program
     (the discriminator);
  B. same, but the pallas inputs go through jnp.copy() materialization
     first (layout canonicalization attempt);
  C. same with the y0 pass only, no z/h_s context (shrinks the program).

Usage (TPU): python tools/debug_pallas_incontext.py [--lanes 512]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp
from flax import nnx


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--lanes", type=int, default=512)
    p.add_argument("--stages", default="A,B,C")
    args = p.parse_args()

    from flashgmm_tpu.models.ckbd_gmm import Cheng2020AnchorCheckerboardGMMv2
    from flashgmm_tpu.runtime import FastLatencyGmmCodec
    from flashgmm_tpu.ans import interleaved as il
    from flashgmm_tpu.ans.pallas_coder import decode_scan_pallas
    from flashgmm_tpu.datasets.synthetic import textured_leaves
    import bench as B

    model = Cheng2020AnchorCheckerboardGMMv2(N=192, K=4, rngs=nnx.Rngs(0))
    B._load_bench_weights(model)
    model.update(update_quantiles=True)
    x = jax.device_put(
        jnp.asarray(textured_leaves(768, 512, seed=500001))[None])

    lc = FastLatencyGmmCodec(model, lanes=args.lanes, cap_divisor=4,
                             pallas_decode=False)
    enc = lc._encode_jit(lc._state, x, lc.cap_divisor)
    ps_z, ps0, ps1, sym0, sym1, y_hat = enc
    b, hh, wh, c = (x.shape[0], sym0.shape[1], sym0.shape[2] * 2,
                    sym0.shape[3])
    y_shape = (b, hh, wh, c)
    w = args.lanes

    def decode_both(state, ps0_, rows0, n, lo, copy_inputs):
        t, _ = il.layout(n, w)
        active = il.active_mask(n, t, w)
        rows_l = il.to_lanes(rows0, w, fill=0)
        L = rows0.shape[-1]
        dummy = (jnp.arange(L, dtype=jnp.int32)
                 * (65536 // (L - 1))).clip(0, 65536)
        rows_l = jnp.where(active[..., None], rows_l, dummy)
        s_scan = il.decode_scan(ps0_.states, ps0_.stream, rows_l, active, lo)
        pa = (ps0_.states, ps0_.stream, rows_l, active)
        if copy_inputs:
            pa = tuple(jnp.copy(v) for v in pa)
        s_pal = decode_scan_pallas(pa[0], pa[1], pa[2], pa[3], lo)
        return s_scan, s_pal

    stages = args.stages.split(",")

    if "A" in stages or "B" in stages:
        for tag, copy_inputs in (("A", False), ("B", True)):
            if tag not in stages:
                continue

            @jax.jit
            def fused(state, passes, copy_inputs=copy_inputs):
                ps_z_, ps0_, ps1_ = passes
                # replicate the latency decode context up to rows0
                m, ckbd, hyper, gmm_lc = lc._modules(state)
                eb = hyper.entropy_bottleneck
                z_rows, z_off, z_maxbin = lc._z_tables(eb)
                zh, zw = hh // 4, wh // 4
                n_z = b * zh * zw * eb.channels
                rows_per_sym = lc._z_rows_per_sym(z_rows, b * zh * zw)
                from flashgmm_tpu.runtime.fast_codec import _decode_pass
                z_bin = _decode_pass(ps_z_, rows_per_sym, n_z, jnp.int32(0),
                                     w, False).reshape(b, zh, zw, eb.channels)
                med = eb._get_medians()[:, 0, 0]
                z_hat = (z_bin + z_off).astype(jnp.float32) + med
                side = ckbd.unembed(hyper.h_s(z_hat))
                lo, _ = lc._lo_bins()
                rows0 = lc._rows0(ckbd, gmm_lc, side[0])
                return decode_both(state, ps0_, rows0, rows0.shape[0], lo,
                                   copy_inputs)

            s_scan, s_pal = fused(lc._state, (ps_z, ps0, ps1))
            a, bb = np.asarray(s_scan), np.asarray(s_pal)
            mm = int(np.sum(a != bb))
            print(f"stage {tag} (copy_inputs={copy_inputs}): "
                  f"scan-vs-pallas mismatch {mm}/{a.size} "
                  f"(lane-major [T, W])", flush=True)

    if "C" in stages:
        # y0 pass alone in a small program (control: known exact)
        @jax.jit
        def small(state, ps0_, sym0_):
            m, ckbd, hyper, gmm_lc = lc._modules(state)
            zh, zw = hh // 4, wh // 4
            eb = hyper.entropy_bottleneck
            z_rows, z_off, _ = lc._z_tables(eb)
            rows_per_sym = lc._z_rows_per_sym(z_rows, b * zh * zw)
            from flashgmm_tpu.runtime.fast_codec import _decode_pass
            n_z = b * zh * zw * eb.channels
            z_bin = _decode_pass(ps_z, rows_per_sym, n_z, jnp.int32(0),
                                 w, False).reshape(b, zh, zw, eb.channels)
            med = eb._get_medians()[:, 0, 0]
            z_hat = (z_bin + z_off).astype(jnp.float32) + med
            side = ckbd.unembed(hyper.h_s(z_hat))
            lo, _ = lc._lo_bins()
            rows0 = lc._rows0(ckbd, gmm_lc, side[0])
            return decode_both(state, ps0_, rows0, rows0.shape[0], lo, False)

        s_scan, s_pal = small(lc._state, ps0, sym0)
        a, bb = np.asarray(s_scan), np.asarray(s_pal)
        print(f"stage C (no extra context): scan-vs-pallas mismatch "
              f"{int(np.sum(a != bb))}/{a.size}", flush=True)


if __name__ == "__main__":
    main()
