"""Execution-metrics introspection — read back what a job actually
did (rows scanned, shuffle volume, spills) instead of guessing.

Spark attaches SQLMetrics to every physical operator; the UI renders
them but pipelines rarely consume them. This walks the executed plan
tree after an action and returns the metrics as plain rows, so a job
can assert its own physical behavior ("the probe side scanned fewer
rows than the fact table", "no spill") the same way tests assert
logical results — the programmatic form of reading `.explain()`.

Driver-side only and bounded by plan size; call AFTER an action so
the metrics are populated (AQE finalizes the plan on first
execution).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def collect_metrics(df: DataFrame) -> list[dict]:
    """[{node, metric, value}] for every operator in the EXECUTED
    plan (AQE final plan). Values are the accumulated totals across
    tasks."""
    plan = df._jdf.queryExecution().executedPlan()
    out: list[dict] = []

    def walk(node):
        name = node.nodeName()
        metrics = node.metrics()
        it = metrics.iterator()
        while it.hasNext():
            kv = it.next()
            metric = kv._1()
            sql_metric = kv._2()
            out.append({"node": name, "metric": str(metric),
                        "value": int(sql_metric.value())})
        # adaptive nodes hide their executed subtree behind
        # executedPlan/finalPhysicalPlan accessors
        cls = node.getClass().getName()
        if cls.endswith("AdaptiveSparkPlanExec"):
            walk(node.executedPlan())
            return
        if cls.endswith(("QueryStageExec", "ShuffleQueryStageExec",
                         "BroadcastQueryStageExec", "ResultQueryStageExec")):
            walk(node.plan())
            return
        ch = node.children()
        cit = ch.iterator()
        while cit.hasNext():
            walk(cit.next())

    walk(plan)
    return out


def metric_total(df: DataFrame, metric_substr: str,
                 node_substr: str = "") -> int:
    """Sum of all metrics whose KEY contains ``metric_substr`` (and
    whose node contains ``node_substr``) — e.g. ('numOutputRows',
    'Scan') = total rows read from sources. Keys are the camelCase
    SQLMetric names ('numOutputRows', 'shuffleBytesWritten',
    'spillSize', ...), not the UI display strings."""
    return sum(m["value"] for m in collect_metrics(df)
               if metric_substr in m["metric"]
               and node_substr in m["node"])


def shuffle_bytes(df: DataFrame) -> int:
    """Total shuffle bytes written by the (executed) query — the
    number to watch when validating a partitioning strategy."""
    return metric_total(df, "shuffleBytesWritten")


def spill_bytes(df: DataFrame) -> int:
    """Total disk spill — nonzero means partitions exceeded executor
    memory: repartition finer or raise parallelism."""
    return metric_total(df, "spillSize")
