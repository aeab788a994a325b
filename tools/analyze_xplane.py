"""Decompose a jax.profiler xplane trace: device-busy vs idle-gap time.

VERDICT r4 weak #6: the bench's `t_fetch` accounting (1.2-1.7 s of a
~2 s timed epoch) was ASSERTED to be device execution rather than idle
relay RTT; this tool measures it. Feed it the `--profile_dir` of a
bench run (bench.py --profile_dir /tmp/prof_epoch) and it reports, per
XLA module and for the whole trace:

- device busy time (union of "XLA Modules" events on /device:TPU:0 —
  module spans cover their ops, so the union is wall device occupancy),
- gap time between consecutive module executions (device idle: host
  dispatch, relay RTT, python),
- the largest gaps with their neighboring modules (what the device was
  waiting between).

The tensorboard-plugin native converter is broken in this image
(pywrap symbol mismatch); this parses the raw xplane proto via the
bundled tsl protobuf instead. Run with
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python if the fast-proto layer
rejects the generated code.

Usage: python tools/analyze_xplane.py <profile_dir_or_xplane.pb> [-n 10]
"""
import argparse
import glob
import os
import sys
from collections import defaultdict


def load_xspace(path):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    if os.path.isdir(path):
        cands = glob.glob(os.path.join(path, "**", "*.xplane.pb"),
                          recursive=True)
        if not cands:
            raise FileNotFoundError(f"no *.xplane.pb under {path}")
        path = max(cands, key=os.path.getmtime)
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs, path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help="profile dir or xplane.pb file")
    ap.add_argument("-n", "--top", type=int, default=10)
    ap.add_argument("--ops", action="store_true",
                    help="also print the top XLA ops by device time")
    args = ap.parse_args()

    xs, path = load_xspace(args.path)
    print(f"# {path}")
    plane = next((p for p in xs.planes if p.name == "/device:TPU:0"), None)
    if plane is None:
        names = [p.name for p in xs.planes]
        raise SystemExit(f"no /device:TPU:0 plane; planes: {names}")
    ev_names = {k: v.name for k, v in plane.event_metadata.items()}

    mline = next((l for l in plane.lines if l.name == "XLA Modules"), None)
    if mline is None:
        raise SystemExit("no 'XLA Modules' line in the device plane")
    evs = sorted(
        ((e.offset_ps, e.duration_ps,
          ev_names.get(e.metadata_id, str(e.metadata_id)))
         for e in mline.events),
        key=lambda t: t[0],
    )
    if not evs:
        raise SystemExit("empty module line")
    span = evs[-1][0] + evs[-1][1] - evs[0][0]
    busy = sum(d for _, d, _ in evs)
    per_mod = defaultdict(lambda: [0, 0])
    for _, d, n in evs:
        base = n.split("(")[0]
        per_mod[base][0] += d
        per_mod[base][1] += 1
    gaps = []
    for (o1, d1, n1), (o2, _, n2) in zip(evs, evs[1:]):
        g = o2 - (o1 + d1)
        if g > 0:
            gaps.append((g, n1.split("(")[0], n2.split("(")[0]))
    gap_total = sum(g for g, _, _ in gaps)

    ms = 1e-9
    print(f"trace span      : {span * ms:10.2f} ms")
    print(f"device busy     : {busy * ms:10.2f} ms ({busy / span:6.1%})")
    print(f"inter-module gap: {gap_total * ms:10.2f} ms "
          f"({gap_total / span:6.1%})  <- host dispatch / relay RTT / "
          f"python between device programs")
    print("\nper-module device time:")
    for n, (d, c) in sorted(per_mod.items(), key=lambda kv: -kv[1][0]):
        print(f"  {d * ms:10.2f} ms  x{c:4d}  {n[:70]}")
    print(f"\ntop {args.top} gaps (device idle between programs):")
    for g, a, b in sorted(gaps, reverse=True)[: args.top]:
        print(f"  {g * ms:10.2f} ms  after {a[:40]:40s} -> {b[:40]}")

    if args.ops:
        oline = next((l for l in plane.lines if l.name == "XLA Ops"), None)
        if oline is not None:
            tot = defaultdict(int)
            cnt = defaultdict(int)
            for e in oline.events:
                n = ev_names.get(e.metadata_id, str(e.metadata_id))
                n = n.split(" = ")[0]
                tot[n] += e.duration_ps
                cnt[n] += 1
            print("\ntop ops by device time:")
            for n, d in sorted(tot.items(), key=lambda kv: -kv[1])[:25]:
                print(f"  {d * ms:10.3f} ms  x{cnt[n]:5d}  {n}")


if __name__ == "__main__":
    main()
