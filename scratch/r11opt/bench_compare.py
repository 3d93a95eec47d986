"""Compare two bench logs: python bench_compare.py before.log after.log"""
import json
import sys


def load(p):
    lines = [json.loads(l) for l in open(p)]
    final = lines[-1]
    extra = next(l for l in lines if l.get("detail") == "extra_queries")["timings"]
    warm = next(l for l in lines if l.get("detail") == "queries_warm")["timings"]
    return final, extra, warm


b, eb, wb = load(sys.argv[1])
a, ea, wa = load(sys.argv[2])
print(f"{'':24s} {'before':>10s} {'after':>10s}")
for k in ("value", "warm_total", "extra_total"):
    print(f"{k:24s} {b[k]:10.1f} {a[k]:10.1f}")
for k in b["normalized"]:
    bv, av = b["normalized"].get(k), a["normalized"].get(k)
    if bv is not None and av is not None:
        print(f"norm.{k:19s} {bv:10.1f} {av:10.1f}")
print("drift:", b["anchor"]["vm_drift"], "->", a["anchor"]["vm_drift"])
print("\nextras improved most (sec):")
deltas = {k: eb[k] - ea.get(k, 0) for k in eb if k in ea}
for k, d in sorted(deltas.items(), key=lambda x: -x[1])[:15]:
    print(f"  {k:38s} {eb[k]:8.1f} -> {ea[k]:8.1f}")
print("\nextras regressed most (sec):")
for k, d in sorted(deltas.items(), key=lambda x: x[1])[:8]:
    print(f"  {k:38s} {eb[k]:8.1f} -> {ea[k]:8.1f}")
print("\nheadline warm best-of-N:")
for k in wb:
    print(f"  {k:30s} {wb[k]:7.3f} -> {wa[k]:7.3f}")
