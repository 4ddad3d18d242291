"""Regenerate bench_bands.json from clean bench runs (same convention
as the r11 bands: ceiling ~= 1.8x the clean stage time, only for stages
whose clean time is large enough that the +5 s retry threshold can
meaningfully fire).

Usage: python tools/regen_bands.py run1.json [run2.json ...]
Each runN.json is a bench_extras.json-shaped payload (or the bench
stdout line).  Uses the MIN across runs as the clean reference.
"""
import json
import math
import sys

runs = []
for p in sys.argv[1:]:
    with open(p) as f:
        txt = f.read()
    if txt.lstrip().startswith("{"):
        d = json.loads(txt)
    else:  # stdout log: find the JSON line
        d = json.loads([ln for ln in txt.splitlines()
                        if ln.startswith('{"metric"')][0])
    runs.append(d["queries"])

stages = set().union(*[set(q) for q in runs])
bands = {}
for s in sorted(stages):
    vals = [q[s] for q in runs if s in q]
    clean = min(vals)
    if clean < 0.3:
        continue  # sub-noise stages: an overrun there is not worth a retry
    # the retry trigger is dt > band AND dt - band > 5 s, so the band
    # value mostly decides WHICH stages are retry-eligible; 1.8x clean
    # (floor 0.5) keeps the r11 convention
    bands[s] = max(0.5, round(math.ceil(clean * 1.8 * 10) / 10, 1))

out = json.dumps(bands, indent=1, sort_keys=True)
with open("bench_bands.json", "w") as f:
    f.write(out)
print(out)
