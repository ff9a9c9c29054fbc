"""Isolated per-query perf measurement + plan capture (round-13 tooling).

For each named query: run through the noop sink (guide §1.4) best-of-N,
reading drained executor-CPU before/after each attempt (stage-completion
posts are async — scripts/llm_e2e_stage_cpu.py finding), and optionally
dump `.explain("formatted")` to plans/<dir>/<query>_<tag>.txt.

Usage:
    python scripts/qperf.py q1 [q2 ...] [--n 3] [--plan before|after] [--plandir r14]
    python scripts/qperf.py --top 20            # 20 highest-CPU from BENCH_DETAIL.json

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS (32).
Prints one JSON line per query: {"query":..., "wall": best, "cpu": best, "attempts": N}.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    n_attempts = 3
    plan_tag = None
    plan_dir = "r14"
    names: list[str] = []
    top = 0
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--n":
            n_attempts = int(args[i + 1]); i += 2
        elif a == "--plan":
            plan_tag = args[i + 1]; i += 2
        elif a == "--plandir":
            plan_dir = args[i + 1]; i += 2
        elif a == "--top":
            top = int(args[i + 1]); i += 2
        else:
            names.append(a); i += 1
    if top:
        with open(os.path.join(REPO, "BENCH_DETAIL.json")) as fh:
            det = json.load(fh)
        cpu = det["executor_cpu_sec"]
        names += [k for k, _ in sorted(cpu.items(), key=lambda kv: -kv[1])[:top]
                  if k not in names]

    from etdtransform_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(
        "qperf",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 32),
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "200000",
            "spark.appStateStore.asyncTracking.enable": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    url = (
        f"{spark.sparkContext.uiWebUrl}/api/v1/applications/"
        f"{spark.sparkContext.applicationId}/stages?status=complete"
    )

    def cpu_ns(drain: float = 1.5) -> int:
        time.sleep(drain)
        try:
            with urllib.request.urlopen(url, timeout=10) as resp:
                return sum(s.get("executorCpuTime", 0) for s in json.load(resp))
        except Exception:  # noqa: BLE001
            return -1

    qs = entrymod.queries()
    spark.range(1000).selectExpr("sum(id)").collect()  # codegen warmup
    os.makedirs(os.path.join(REPO, "plans", plan_dir), exist_ok=True)

    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"qperf:{name}")
        best_w = None
        best_c = None
        for _ in range(n_attempts):
            c0 = cpu_ns()
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            w = time.perf_counter() - t0
            c1 = cpu_ns()
            best_w = w if best_w is None else min(best_w, w)
            if c0 >= 0 and c1 >= c0:
                d = (c1 - c0) / 1e9
                best_c = d if best_c is None else min(best_c, d)
        if plan_tag:
            df = fn(spark, SF_DIR)
            with open(
                os.path.join(REPO, "plans", plan_dir, f"{name}_{plan_tag}.txt"), "w"
            ) as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        print(json.dumps({
            "query": name,
            "wall": round(best_w, 3),
            "cpu": round(best_c, 3) if best_c is not None else -1.0,
            "attempts": n_attempts,
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
