"""Analytic FLOP/byte accounting + TPU v5e roofline reports (VERDICT r3 #3).

The benchmark (bench.py) reports, per hot stage, achieved TFLOP/s as a
percentage of MXU peak ("MFU"), achieved HBM GB/s as a percentage of HBM
peak, and the speed-of-light ratio ``sol_x = measured / max(compute-bound,
memory-bound minimum time)`` — so perf claims are auditable numbers, not
adjectives, and a regression has a price tag.

FLOP counts are ANALYTIC from the algorithm's dimensions (documented per
formula below), never from a profiler. Two counts are kept where they
differ:

* ``executed``: what the hardware actually multiplies. The packed decoder
  issues DENSE (G*H, 4*G*H) contractions whose operands are block-diagonal
  (ops/pallas/decoder.py::_pack_all), so the MXU executes G x the useful
  work. Hardware-utilization MFU is computed from this count.
* ``useful``: the algorithmically required flops (block-diagonal only).
  ``useful/executed`` is the packing's algorithmic efficiency — the lane-
  packing trades redundant MXU flops for VPU-friendly full-width lanes,
  a deliberate, now-priced deviation.

Element-wise work (activations, masks, softmax) is excluded: on the MXU
roofline it is free, and on the HBM roofline it is covered by the byte
counts. Byte counts are SPEED-OF-LIGHT minimums (stage inputs + outputs +
parameters once; fused intermediates assumed to stay on-chip), so
``hbm_pct`` is a lower bound on achieved bandwidth for memory-bound stages.

Peak numbers (single TPU v5e chip, public "How to Scale Your Model" specs):
197 TFLOP/s bf16 MXU, 819 GB/s HBM. f32-STORED matmuls still execute at
the bf16 MXU rate under JAX's default matmul precision on TPU (operands
are convert-rounded to bf16, accumulation in f32), so one peak serves both
benchmark dtypes; byte counts do distinguish 4- vs 2-byte storage.
"""

from __future__ import annotations

V5E_PEAK_FLOPS = 197e12  # bf16 MXU peak, FLOP/s
V5E_HBM_BPS = 819e9      # HBM bandwidth, bytes/s

# VPU (elementwise) peaks: 8x128 lanes, ~4 ALUs, ~0.94 GHz -> ~3.9 T
# element-ops/s for simple ops. Transcendentals (sigmoid/tanh exp
# microcode) issue at ~1 eval/cycle/lane on one port -> ~0.96 T evals/s;
# this figure is cross-validated by measurement: the r3 linear-stand-in
# ablation (benchmarks/decode_ablation.py) removed 10.6 ms of kernel time
# for 10.05 G transcendental evals = 0.95 T evals/s (BASELINE.md).
V5E_VPU_OPS = 3.85e12
V5E_VPU_TRANSC = 0.96e12


def stage_report(flops_executed, min_bytes, seconds, flops_useful=None):
    """Roofline summary for one measured stage.

    Returns a flat dict (for BENCH extras): achieved tflops, mfu_pct
    (executed flops vs MXU peak), gbps, hbm_pct (min bytes vs HBM peak),
    the binding resource, the speed-of-light time for this (flops, bytes)
    pair, and how many x away from it the measurement sits.
    """
    tflops = flops_executed / seconds / 1e12
    gbps = min_bytes / seconds / 1e9
    t_compute = flops_executed / V5E_PEAK_FLOPS
    t_memory = min_bytes / V5E_HBM_BPS
    sol_s = max(t_compute, t_memory)
    out = {
        "tflops": round(tflops, 2),
        "mfu_pct": round(100.0 * tflops * 1e12 / V5E_PEAK_FLOPS, 2),
        "gbps": round(gbps, 1),
        "hbm_pct": round(100.0 * gbps * 1e9 / V5E_HBM_BPS, 1),
        "bound": "compute" if t_compute >= t_memory else "memory",
        "sol_ms": round(sol_s * 1e3, 3),
        "sol_x": round(seconds / sol_s, 1),
    }
    if flops_useful is not None:
        out["useful_flops_pct"] = round(100.0 * flops_useful / flops_executed, 1)
    return out


def decoder_flops(g, h, in_dim, soc_f, rows, pred_len, select=True,
                  dtype_bytes=4):
    """Fused Pallas rollout (ops/pallas/decoder.py): per row per step the
    kernel issues one (1, G*in + G*H) x (G*in + G*H, 4*G*H) gate
    contraction and the two hidden2pos matmuls (hid = H//2):

        gates  2*(G*in + G*H)*(4*G*H)      [dense; useful: /G]
        lin0   2*(G*H)*(G*hid)             [dense; useful: /G]
        lin1   2*(G*hid)*(G*2)             [dense; useful: /G]

    plus the per-call social hoist socb = social @ w1s (XLA, outside the
    kernel): 2*rows*soc_f*(G*hid) — already block-diagonal-free (useful ==
    executed).

    Min bytes: h0/c0 + socb + xy in; selected (T,2) rollout out (select) or
    the all-generator (T, G*2) out (decode-all); packed weights once.
    """
    hid = h // 2
    per_step_exec = (
        2 * (g * in_dim + g * h) * (4 * g * h)
        + 2 * (g * h) * (g * hid)
        + 2 * (g * hid) * (g * 2)
    )
    per_step_useful = (
        2 * g * (in_dim + h) * (4 * h)
        + 2 * g * h * hid
        + 2 * g * hid * 2
    )
    socb = 2 * rows * soc_f * (g * hid)
    executed = rows * pred_len * per_step_exec + socb
    useful = rows * pred_len * per_step_useful + socb
    out_lanes = 2 if select else g * 2
    weights = (
        (g * in_dim + g * h) * (4 * g * h)  # packed gate weights
        + (g * h) * (g * hid) + (g * hid) * (g * 2)
    ) * dtype_bytes
    min_bytes = (
        rows * (2 * g * h) * dtype_bytes      # h0, c0
        + rows * (g * hid) * dtype_bytes      # socb
        + rows * 4 * dtype_bytes              # last xy + dxdy
        + rows * pred_len * out_lanes * dtype_bytes
        + weights
    )
    return {"executed": executed, "useful": useful, "min_bytes": min_bytes}


def decoder_vpu_ops(g, h, rows, pred_len):
    """Analytic VPU elementwise-op count of the fused decode kernel body
    (ops/pallas/decoder.py::_fwd_select_kernel), per the MXU roofline's
    blind spot: every per-step vector op on the (rows, 4*G*H) gate stream.

    Per row per step, with gh = G*H, ghid = G*(H//2):

        adds into gates (+whh dot acc, +b)        2 * 4*gh
        c = f*c + i*gg; h = o*tanh(c) muls        4 * gh
        hid += socb; leaky-relu where             3 * ghid
        nd + b2; xy += nd; oh2 muls + reduce      ~8 * 2*g
        transcendentals: 3 sigmoid + 2 tanh       5 * gh   (separate pool)

    Returns {"elementwise", "transcendental"} total op counts; time floors
    are elementwise / V5E_VPU_OPS and transcendental / V5E_VPU_TRANSC
    (different issue ports — the floors add at worst, overlap at best).
    """
    gh = g * h
    ghid = g * (h // 2)
    elem = rows * pred_len * (2 * 4 * gh + 4 * gh + 3 * ghid + 16 * g)
    transc = rows * pred_len * 5 * gh
    return {"elementwise": elem, "transcendental": transc}


def scene_cnn_flops(batch, channels=16, in_ch=4, dtype_bytes=4):
    """Scene CNN (ops/cnn.py::scene_cnn_apply, reference cnn.py:109-116):
    3x3/s1/p1 convs count 2*9*Cin*Cout per output position (border
    positions counted full — XLA executes the padded conv densely):

        conv1  33*33 * 2*9*in_ch*C
        conv2  16*16 * 2*9*C*C        (after 2x2 maxpool)
        attn   8*8  * 2*(C*32 + 32*C) (channel-attention MLP)

    Min bytes: patches in + (B, 64) encoding out + weights once.
    """
    conv1 = 33 * 33 * 2 * 9 * in_ch * channels
    conv2 = 16 * 16 * 2 * 9 * channels * channels
    attn = 8 * 8 * 2 * (channels * 32 + 32 * channels)
    per_patch = conv1 + conv2 + attn
    weights = (9 * in_ch * channels + 9 * channels * channels
               + channels * 32 + 32 * channels) * dtype_bytes
    min_bytes = (
        batch * 33 * 33 * in_ch * dtype_bytes
        + batch * 64 * 4  # encoding is always f32 out
        + weights
    )
    return {"executed": batch * per_patch, "useful": batch * per_patch,
            "min_bytes": min_bytes}


def scene_cnn_traffic(batch, channels=16, in_ch=4, act_bytes=4):
    """ATTAINABLE-traffic model for the XLA scene-CNN stack — unlike
    ``scene_cnn_flops``'s speed-of-light ``min_bytes`` (inputs + outputs
    only), this prices the inter-stage intermediates XLA actually
    materializes in HBM (conv outputs consumed by reduce_window cannot
    fuse into the producing convolution on TPU):

        read patches f32; write+read conv1 out (B,33,33,C); write+read
        pool1 (B,16,16,C); write+read conv2 out; write+read pool2
        (B,8,8,C); attention-head reads + (B,64) f32 encoding out.

    ``act_bytes`` = activation storage (2 for the bf16 eval path).
    Dividing by HBM peak gives the attainable time for THIS program
    structure; a fused single-kernel implementation could in principle
    reach scene_cnn_flops' smaller min_bytes instead (measured in r3 to
    lose end-to-end — BASELINE.md encode row)."""
    conv1_out = batch * 33 * 33 * channels * act_bytes
    pool1_out = batch * 16 * 16 * channels * act_bytes
    conv2_out = batch * 16 * 16 * channels * act_bytes
    pool2_out = batch * 8 * 8 * channels * act_bytes
    return (
        batch * 33 * 33 * in_ch * 4          # patches in, f32
        + 2 * conv1_out                       # write + pool read
        + 2 * pool1_out                       # write + conv2 read
        + 2 * conv2_out                       # write + pool read
        + 2 * pool2_out                       # write + attn read
        + batch * 64 * 4                      # encoding out, f32
    )


def train_step_flops(xla_flops, g, h, in_dim, soc_f, rows_g, rows_d,
                     pred_len):
    """Fused D+G+PM train-step flops = XLA's own HLO cost analysis (covers
    every op XLA compiled, including both CNN fwd/bwd, encoders, losses)
    PLUS the Pallas rollout custom-calls XLA cannot see:

    * D-step fakes + PM-step samples: fused-selection/forward kernel
      (rows_d rollouts, forward only),
    * G-step: train-forward kernel + true backward kernel. The backward
      recomputes the gate activations from the streamed (h, c) sequence —
      one extra gate contraction — and accumulates dW via two transposed
      contractions per matmul: counted as 2x the forward gate matmuls + 1x
      recompute = 3x forward executed flops (the standard 2x-bwd rule plus
      the recompute term, ops/pallas/decoder.py backward docstring).
    """
    fwd_d = decoder_flops(g, h, in_dim, soc_f, rows_d, pred_len)
    fwd_g = decoder_flops(g, h, in_dim, soc_f, rows_g, pred_len)
    pallas = fwd_d["executed"] + 4 * fwd_g["executed"]  # fwd + 3x bwd
    return {"executed": xla_flops + pallas, "xla": xla_flops,
            "pallas": pallas}
