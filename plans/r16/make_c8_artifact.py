"""Run bench.py at SPARK_GRAFT_CPUS=8 (sf1/sf10 sections skipped — the
artifact's purpose is the core-count contract on the headline rows, the
r15 BENCH_r15_c8.json precedent) and wrap stdout in the driver-style
envelope {n, rc, cpus, sf, tail, parsed}.

Run: python plans/r16/make_c8_artifact.py
"""
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))

env = dict(os.environ)
env.update(
    SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1",
    SPARK_GRAFT_CPUS="8",
    SPARK_GRAFT_SF1="0",
    SPARK_GRAFT_SF10="0",
)
# bench.py overwrites the committed BENCH_DETAIL.json on every run;
# the committed detail must stay the 32-core full run, so save and
# restore it around the 8-core probe run.
detail_path = os.path.join(REPO, "BENCH_DETAIL.json")
saved_detail = None
if os.path.exists(detail_path):
    with open(detail_path) as fh:
        saved_detail = fh.read()
try:
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
    )
finally:
    if saved_detail is not None:
        with open(detail_path, "w") as fh:
            fh.write(saved_detail)
tail = proc.stdout[-4000:]
lines = [l for l in proc.stdout.splitlines() if l.strip()]
parsed = json.loads(lines[-1])
out = {
    "n": 16,
    "rc": proc.returncode,
    "cpus": 8,
    "sf": parsed.get("sf"),
    "tail": tail,
    "parsed": parsed,
}
path = os.path.join(REPO, "BENCH_r16_c8.json")
with open(path, "w") as f:
    json.dump(out, f, indent=2)
print("wrote", path, "rc:", proc.returncode, "value:", parsed.get("value"),
      "master:", parsed.get("master"), "zz:",
      parsed.get("queries", {}).get("zz_cpu_scaling_probe"))
