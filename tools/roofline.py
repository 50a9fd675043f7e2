"""
Roofline accounting for the 1024px serving program (VERDICT r3 item 5).

For every block of the config-f synthesis graph AS LOWERED on the production
path (bf16, polyphase top block ON, NCHW RGB chain), this computes from first
principles:

  * algorithmic MXU FLOPs (the useful math the architecture demands),
  * executed MXU FLOPs (what the chosen lowering actually runs — the phase
    rewrite deliberately trades extra MXU FLOPs for dead VPU/BW time, and
    transpose convs execute over dilated inputs),
  * VPU elementwise ops (blurs, noise/bias/lrelu epilogues, skip adds),
  * minimum HBM traffic (activations in + out at the compute dtype, weights,
    noise buffers — assuming perfect fusion, i.e. each tensor crosses HBM
    once; intermediates inside a fused op are free),

and converts them to an attainable-time lower bound

    t_block >= max(exec_mxu / MXU_PEAK, vpu / VPU_PEAK, bytes / HBM_BW)

which, merged with measured per-block times from the xplane trace
(tools/profile_model.py --json), yields the roofline ratio per block: how far
the measured time sits above its hardware floor, and WHICH ceiling (MXU, VPU,
or HBM) the block is pinned against.

Peaks used (v5e, one chip):
  * MXU bf16: 197 TFLOP/s (datasheet).
  * HBM: 819 GB/s (datasheet).
  * VPU: 3.85 T FMA/s theoretical (8x128 lanes x 4 ALUs x 940 MHz, FMA
    counted as one op); the r3 profile measured XLA's 16-tap 2D blur at
    ~1.05 T FMA/s sustained (~27% issue efficiency), so VPU-heavy blocks
    bind on HBM in practice — the floor uses the theoretical number so a
    ratio of 1.0 always means "at a hardware limit", never "at XLA's habit".

Usage:
  python tools/roofline.py                      # analytic table only
  python tools/roofline.py measured.json        # + measured ms, roofline ratio
where measured.json maps block name -> device ms/iter (see
ROUND_NOTES.md "Roofline accounting" for the trace -> block mapping).
"""

import json
import math
import sys
from dataclasses import dataclass
from typing import Dict, List, Optional

MXU_PEAK = 197e12  # bf16 FLOP/s, v5e datasheet
HBM_BW = 819e9  # bytes/s, v5e datasheet
VPU_PEAK = 3.85e12  # FMA/s, theoretical (1024 lanes x 4 ALUs x 940 MHz)
VPU_MEASURED = 1.05e12  # FMA/s XLA's fused 16-tap blur sustains (r3 profile)

BATCH = 24
DTYPE_BYTES = 2  # bf16


def nf(stage: int, fmap_base: int = 32768, fmap_max: int = 512) -> int:
    return min(max(int(fmap_base / (2.0**stage)), 1), fmap_max)


@dataclass
class Block:
    name: str
    alg_mxu: float = 0.0  # algorithmic MXU FLOPs (batch total)
    exec_mxu: float = 0.0  # executed MXU FLOPs on the chosen lowering
    vpu: float = 0.0  # elementwise ops
    bytes: float = 0.0  # min HBM traffic
    note: str = ""

    @property
    def attainable_ms(self) -> float:
        return 1e3 * max(
            self.exec_mxu / MXU_PEAK, self.vpu / VPU_PEAK, self.bytes / HBM_BW
        )

    @property
    def bound(self) -> str:
        terms = {
            "MXU": self.exec_mxu / MXU_PEAK,
            "VPU": self.vpu / VPU_PEAK,
            "HBM": self.bytes / HBM_BW,
        }
        return max(terms, key=terms.get)


def conv_bytes(res: int, cin: int, cout: int, kh: int = 3, kw: int = 3,
               in_res: Optional[int] = None, rgb_out: bool = False) -> float:
    """Min HBM traffic for one fused modulated conv: read input activations,
    write output activations, read weights once; style vectors are negligible."""
    in_res = in_res or res
    read = BATCH * in_res * in_res * cin * DTYPE_BYTES
    out_c = 3 if rgb_out else cout
    write = BATCH * res * res * out_c * DTYPE_BYTES
    weights = kh * kw * cin * cout * 4  # fp32 master weights
    return read + write + weights


def build_blocks(resolution: int = 1024, phase_top: bool = True) -> List[Block]:
    top = int(math.log2(resolution))
    blocks: List[Block] = []

    # Mapping network: 8 FC 512x512 per sample (+ lerf/broadcast, negligible).
    fc = 2 * BATCH * 512 * 512 * 8
    blocks.append(
        Block("mapping (8xFC512)", alg_mxu=fc, exec_mxu=fc,
              bytes=8 * 512 * 512 * 4 + 2 * BATCH * 512 * 4 * 8,
              note="latency-bound; 18-row broadcast is free")
    )

    # 4x4 block: Conv (3x3 512->512 @4^2) + ToRGB.
    c = 2 * BATCH * 4 * 4 * 9 * 512 * 512
    blocks.append(
        Block("4x4 Conv+ToRGB", alg_mxu=c, exec_mxu=c,
              bytes=conv_bytes(4, 512, 512) + conv_bytes(4, 512, 3, 1, 1, rgb_out=True),
              vpu=BATCH * 4 * 4 * 512 * 4,
              note="weight-read dominated at 4^2")
    )

    for r in range(3, top + 1):
        res = 2**r
        cin, cout = nf(r - 2), nf(r - 1)
        if r == top and phase_top and cout < 128:
            # Polyphase top block: conv0_up+blur folded into ONE stride-1
            # (3,3,cin,4*cout) conv at half res (output grid (res/2+1)^2);
            # conv1 -> (2,2,4*cout,4*cout); ToRGB phase-diagonal
            # (1,1,4*cout,12). Executed = dense phase form (4x the transpose
            # conv's useful taps on P, 1.78x on C1 from the padded 2x2
            # support); algorithmic = the standard form's useful FLOPs.
            half = res // 2
            grid = half + 1
            # P conv (fused Conv0_up + FIR blur)
            alg_up = 2 * BATCH * half * half * 9 * cin * cout  # transpose conv useful taps
            exec_up = 2 * BATCH * grid * grid * 9 * cin * 4 * cout
            b_up = (BATCH * half * half * cin * DTYPE_BYTES
                    + BATCH * grid * grid * 4 * cout * DTYPE_BYTES
                    + 9 * cin * 4 * cout * 4)
            blocks.append(Block(
                f"P conv (3,3,{cin},{4*cout})@{half}^2", alg_mxu=alg_up,
                exec_mxu=exec_up, bytes=b_up,
                vpu=BATCH * grid * grid * 4 * cout * 4,  # demod+noise+bias+lrelu
                note="folds the 16-tap VPU blur into the MXU; 4x phase stacking "
                     f"fills lanes cout={cout}<128 leaves idle"))
            # C1 conv
            alg_c1 = 2 * BATCH * res * res * 9 * cout * cout
            exec_c1 = 2 * BATCH * grid * grid * 4 * 4 * cout * 4 * cout
            b_c1 = (2 * BATCH * grid * grid * 4 * cout * DTYPE_BYTES
                    + 4 * 4 * cout * 4 * cout * 4)
            blocks.append(Block(
                f"C1 conv (2,2,{4*cout},{4*cout})@{half}^2", alg_mxu=alg_c1,
                exec_mxu=exec_c1, bytes=b_c1,
                vpu=BATCH * grid * grid * 4 * cout * 4,
                note="3x3 conv1 in sigma-shifted 2x2 phase form; full lanes"))
            # phase ToRGB
            alg_rgb = 2 * BATCH * res * res * cout * 3
            exec_rgb = 2 * BATCH * grid * grid * 4 * cout * 12
            b_rgb = (BATCH * grid * grid * 4 * cout * DTYPE_BYTES
                     + BATCH * res * res * 3 * DTYPE_BYTES)
            blocks.append(Block(
                f"phase ToRGB (1,1,{4*cout},12)@{half}^2", alg_mxu=alg_rgb,
                exec_mxu=exec_rgb, bytes=b_rgb,
                note="phase-diagonal 1x1; reads C1's full activation set"))
            # final interleave + skip add + NHWC transpose + uint8
            b_il = (BATCH * res * res * 3 * DTYPE_BYTES * 2  # read phases, write NCHW
                    + BATCH * res * res * 3 * DTYPE_BYTES * 2  # skip add r/w
                    + BATCH * res * res * 3 * DTYPE_BYTES  # read for NHWC+uint8
                    + BATCH * res * res * 3)  # uint8 out
            blocks.append(Block(
                f"interleave+skip+NHWC+uint8@{res}", bytes=b_il,
                vpu=BATCH * res * res * 3 * 6,
                note="pure data movement; floor = 5 RGB-image crossings + uint8"))
            # RGB skip upsample of y (4-tap separable on 3ch, NCHW)
            b_sk = BATCH * (half * half + res * res) * 3 * DTYPE_BYTES
            blocks.append(Block(
                f"skip upsample@{res}", bytes=b_sk,
                vpu=BATCH * res * res * 3 * 8,
                note="NCHW polyphase FIR on the RGB accumulator"))
            continue

        half = res // 2
        # Conv0_up: 3x3 transpose, stride 2. Useful taps: every input pixel
        # feeds 9 outputs. XLA lowers to a dilated conv whose zeros the TPU
        # conv unit skips by phase decomposition -> executed ~= algorithmic
        # (r3 profile: 77% MXU of this count, i.e. no 4x dilation waste).
        c0 = 2 * BATCH * half * half * 9 * cin * cout
        blocks.append(Block(
            f"conv0_up@{res} ({cin}->{cout})", alg_mxu=c0, exec_mxu=c0,
            bytes=conv_bytes(res, cin, cout, in_res=half),
            vpu=BATCH * res * res * cout * 4,
            note="transpose conv; XLA phase-decomposes the dilation"))
        # Post-conv0_up FIR blur: XLA keeps the 16-tap 2D form (the separable
        # two-pass loses its tap saving to the extra HBM round-trip, measured).
        blocks.append(Block(
            f"blur@{res} ({cout}ch)",
            vpu=BATCH * res * res * cout * 16,  # 16 FIR taps (FMA each)
            bytes=2 * BATCH * res * res * cout * DTYPE_BYTES,
            note="16-tap 2D FIR; HBM floor binds (XLA sustains ~27% VPU issue)"))
        # Conv1 3x3
        c1 = 2 * BATCH * res * res * 9 * cout * cout
        blocks.append(Block(
            f"conv1@{res} ({cout}ch)", alg_mxu=c1, exec_mxu=c1,
            bytes=conv_bytes(res, cout, cout),
            vpu=BATCH * res * res * cout * 4,
            note="the workhorse; MXU-bound at full lanes" if cout >= 128
            else "cout<128 caps lane utilization"))
        # ToRGB 1x1 -> NCHW
        rgb = 2 * BATCH * res * res * cout * 3
        blocks.append(Block(
            f"ToRGB@{res}", alg_mxu=rgb, exec_mxu=rgb,
            bytes=conv_bytes(res, cout, 3, 1, 1, rgb_out=True),
            note="HBM-bound: re-reads conv1's full activation set"))
        # RGB skip upsample
        blocks.append(Block(
            f"skip upsample@{res}",
            bytes=BATCH * (half * half + res * res) * 3 * DTYPE_BYTES,
            vpu=BATCH * res * res * 3 * 8,
            note="NCHW polyphase FIR, 3 channels"))

    return blocks


def main() -> None:
    measured: Dict[str, float] = {}
    if len(sys.argv) > 1:
        measured = json.loads(open(sys.argv[1]).read())

    blocks = build_blocks()
    total_alg = sum(b.alg_mxu for b in blocks)
    total_exec = sum(b.exec_mxu for b in blocks)
    total_bytes = sum(b.bytes for b in blocks)
    total_att = sum(b.attainable_ms for b in blocks)

    print(f"{'block':44s} {'exec GF':>8s} {'GB':>6s} {'floor ms':>8s} "
          f"{'bound':>5s} {'meas ms':>8s} {'ratio':>6s}")
    rows = []
    for b in blocks:
        m = measured.get(b.name)
        ratio = (m / b.attainable_ms) if m and b.attainable_ms > 0 else None
        print(f"{b.name:44s} {b.exec_mxu/1e9:8.1f} {b.bytes/1e9:6.2f} "
              f"{b.attainable_ms:8.2f} {b.bound:>5s} "
              f"{'' if m is None else f'{m:8.2f}':>8s} "
              f"{'' if ratio is None else f'{ratio:6.2f}':>6s}  {b.note}")
        rows.append({
            "block": b.name, "alg_gflops": round(b.alg_mxu / 1e9, 1),
            "exec_gflops": round(b.exec_mxu / 1e9, 1),
            "vpu_gops": round(b.vpu / 1e9, 1), "gbytes": round(b.bytes / 1e9, 3),
            "floor_ms": round(b.attainable_ms, 3), "bound": b.bound,
            "measured_ms": m,
            "roofline_ratio": None if ratio is None else round(ratio, 2),
            "note": b.note,
        })

    total_meas = sum(v for v in measured.values() if v) if measured else None
    summary = {
        "batch": BATCH,
        "alg_gflops_per_frame": round(total_alg / BATCH / 1e9, 1),
        "exec_gflops_per_frame": round(total_exec / BATCH / 1e9, 1),
        "gbytes_per_batch": round(total_bytes / 1e9, 2),
        "attainable_ms_per_batch": round(total_att, 1),
        "attainable_fps": round(BATCH / (total_att / 1e3), 1),
        "measured_ms_sum": None if total_meas is None else round(total_meas, 1),
        "mxu_only_floor_ms": round(1e3 * total_exec / MXU_PEAK, 1),
        "hbm_only_floor_ms": round(1e3 * total_bytes / HBM_BW, 1),
    }
    print()
    print(json.dumps({"summary": summary, "blocks": rows}))


if __name__ == "__main__":
    main()
