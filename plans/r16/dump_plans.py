"""Dump explain("formatted") for named headline queries at the bench
config (local[32], 32 shuffle partitions, sf0.1) into
plans/r16/<query>_<suffix>.txt.

Run: python plans/r16/dump_plans.py <suffix> <query> [<query> ...]
"""
import io
import os
import sys
from contextlib import redirect_stdout

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(HERE)))

from csvb_spark.session import get_session
from csvb_spark.queries import corpus

suffix = sys.argv[1]
names = sys.argv[2:]
spark = get_session(
    app_name="dump_plans_r16", master="local[32]", shuffle_partitions=32
)
qs = corpus()
for n in names:
    df = qs[n].spark(spark, "/root/testdata/sf0.1")
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    path = os.path.join(HERE, f"{n}_{suffix}.txt")
    with open(path, "w") as f:
        f.write(buf.getvalue())
    print(f"wrote {path}")
spark.stop()
