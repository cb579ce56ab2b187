"""HBM-byte accounting over a saved device profile (VERDICT r4 items 4/8).

Parses an xplane logdir (written by profile_frame/profile_serving/
profile_train) and sums the BYTES each device op touches, from the shapes
embedded in the HLO op names:

  - "dma bytes": async data movement (copy-start / slice-start / copy /
    dynamic-slice / dynamic-update-slice) — for async slices the moved
    side is the smaller of src/dst.
  - "output bytes": every device op's output-shape bytes (~= HBM writes;
    reads are the producers' outputs, so total traffic ~= 2x this minus
    what stays resident in VMEM).

Dividing by the step count gives bytes/step, and vs the v5e HBM bandwidth
(819 GB/s) a bandwidth-roofline step time — the floor the serving frame
cannot beat no matter how the compute overlaps.

Usage: python tools/profile_bytes.py LOGDIR STEPS [STREAMS]
"""
from __future__ import annotations

import re
import sys
from collections import defaultdict

sys.path.insert(0, __file__.rsplit("/", 1)[0])

HBM_GBPS = 819e9  # TPU v5e

_ITEM = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "f32": 4, "s32": 4, "u32": 4, "f64": 8, "s64": 8, "u64": 8, "c64": 8,
}
_SHAPE_RE = re.compile(r"(pred|s8|u8|s16|u16|bf16|f16|f32|s32|u32|f64|s64|u64|c64)\[([0-9,]*)\]")

_DMA_PREFIX = (
    "copy-start", "slice-start", "copy", "dynamic-slice",
    "dynamic-update-slice", "all-gather-start", "all-reduce-start",
)


def _shape_bytes(dtype: str, dims: str) -> int:
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _ITEM[dtype]


def op_bytes(name: str):
    """(dma_moved_bytes_or_None, output_bytes) parsed from an HLO op name."""
    shapes = [_shape_bytes(d, s) for d, s in _SHAPE_RE.findall(name)]
    if not shapes:
        return None, 0
    base = name.lstrip("%").split(" ")[0]
    base = base.split(".")[0]
    out_b = shapes[0]
    if base.endswith("-done"):
        return None, 0  # the matching -start carries the movement
    if base in ("copy-start", "copy"):
        return shapes[0], out_b
    if base in ("slice-start", "dynamic-slice", "dynamic-update-slice"):
        big = [s for s in shapes[:3] if s > 8]
        return (min(big) if big else shapes[0]), out_b
    if base.startswith(_DMA_PREFIX):
        return shapes[0], out_b
    return None, out_b


def main():
    from profile_frame import parse_xplane  # noqa: E402 (same-dir import)

    logdir = sys.argv[1]
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    streams = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    per_op, _, total = parse_xplane(logdir)
    dma_total = 0
    out_total = 0
    by_op_dma = defaultdict(int)
    for name, dur in per_op.items():
        dma, out_b = op_bytes(name)
        out_total += out_b
        if dma is not None:
            dma_total += dma
            by_op_dma[name] += dma
    # NOTE: parse_xplane sums durations per op name; each name appears once
    # per compiled program, executed `steps` times — so per-name bytes must
    # be multiplied by the execution count. The trace writes one event per
    # execution but parse_xplane merges them by name; recover the count from
    # the fact that every op executes exactly `steps` times in the traced
    # window (single jitted program, no control flow at the top level).
    dma_step = dma_total  # bytes/step: names are unique per program
    out_step = out_total
    frames = steps * streams
    print(f"device-op time: {total*1e3:.2f} ms over {steps} steps")
    print(f"DMA bytes/step:    {dma_step/1e6:10.2f} MB "
          f"({dma_step/streams/1e6:.2f} MB/frame)")
    print(f"output bytes/step: {out_step/1e6:10.2f} MB "
          f"({out_step/streams/1e6:.2f} MB/frame)")
    traffic = dma_step + out_step  # writes + explicit movement (lower bound)
    print(f"traffic lower bound/frame: {traffic/streams/1e6:.2f} MB "
          f"-> HBM roofline {HBM_GBPS/ (traffic/streams):.1f} frames/s")
    print("\n== top DMA byte movers (per step) ==")
    for name, b in sorted(by_op_dma.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {name[:78]:78s} {b/1e6:9.2f} MB")


if __name__ == "__main__":
    main()
