"""Dump the optimized HLO of the PRODUCTION 512² decode chunk program
(the same jitted `_decode_chunk` executable the pipeline runs, so fusion
names line up with chunk_breakdown.py's per-op trace table) and
summarize or print the hot fusions.

Usage:
  python experiments/chunk_hlo.py                 # one-line per fusion/copy
  python experiments/chunk_hlo.py fusion.19 ...   # full fusion bodies
"""
import re
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

from chunk_breakdown import build_chunk_parts  # noqa: E402


def main():
    names = set(sys.argv[1:])
    from float_tpu.runtime import decode as D

    params_c, wa_full, feats_c, disp, paths, cfg = build_chunk_parts()
    lowered = D._decode_chunk.lower(
        params_c, wa_full[:16], feats_c, 512,
        warp_disp=disp, with_stats=True, fixup=False, warp_path=paths)
    txt = lowered.compile().as_text()
    out = "/tmp/chunk_core_opt.hlo"
    with open(out, "w") as f:
        f.write(txt)
    print(f"optimized HLO -> {out} ({len(txt.splitlines())} lines)")

    # computation bodies, keyed by name
    comps = {}
    cur = None
    for line in txt.splitlines():
        if line.rstrip().endswith("{") and ("fused_computation" in line
                                            or line.startswith("ENTRY")):
            cur = line.strip().split()[0].lstrip("%")
            comps[cur] = []
            continue
        if cur is not None:
            if line.strip() == "}":
                cur = None
            else:
                comps[cur].append(line.rstrip())

    fusions = []
    for ln in txt.splitlines():
        s = ln.strip()
        m = re.match(r"%?([\w\.\-]+) = (\S+) fusion\(", s)
        if m:
            cm = re.search(r"calls=%?([\w\.\-]+)", s)
            fusions.append((m.group(1), m.group(2),
                            cm.group(1) if cm else ""))
        m2 = re.match(r"%?([\w\.\-]+) = (\S+) copy\(", s)
        if m2:
            fusions.append((m2.group(1), m2.group(2), "copy"))

    if not names:
        for nm, shape, comp in fusions:
            body = comps.get(comp, [])
            kinds = {}
            for bl in body:
                mm = re.search(r"= \S+ ([a-z\-]+)\(", bl)
                if mm:
                    kinds[mm.group(1)] = kinds.get(mm.group(1), 0) + 1
            big = sorted(kinds.items(), key=lambda kv: -kv[1])[:6]
            print(f"{nm:34s} {shape:46s} {len(body):4d} instrs  "
                  + " ".join(f"{k}:{v}" for k, v in big))
    else:
        for nm, shape, comp in fusions:
            if nm in names:
                print(f"\n==== {nm} -> {shape} (calls {comp}) ====")
                for bl in comps.get(comp, [])[:200]:
                    print(bl)


if __name__ == "__main__":
    main()
