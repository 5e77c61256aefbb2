"""Executor-JVM import path: engine modules must be importable by executor
python workers under a local-cluster master.

Guards the round-4 bench failure mode: exporting PYTHONPATH via os.environ
after the py4j gateway JVM exists is invisible to the Master/Worker/executor
tree, so module-by-reference UDF pickles died with ModuleNotFoundError in
the executor-pair scaling leg. The fix threads the path through
``spark.executorEnv.PYTHONPATH`` (session.get_spark's
SPARK_EXECUTOR_PYTHONPATH hook), which the Worker applies at executor
launch regardless of gateway env.

Runs in a subprocess: the scenario requires creating and stopping sessions
(including a pre-existing gateway), which must not touch the shared
session fixture.
"""

import os
import subprocess
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = """
import os, sys
sys.path.insert(0, {root!r})
from aopwiki_spark.session import get_spark
# 1) launch the gateway with a plain local session (the bench's headline
#    phase) so the local-cluster app below cannot rely on gateway env
sp0 = get_spark("gateway-up", cpus=2, shuffle_partitions=2)
sp0.range(10).count()
sp0.stop()
# 2) executor-backed master + the executorEnv hook
os.environ["SPARK_EXECUTOR_PYTHONPATH"] = {root!r}
os.environ["SPARK_MASTER"] = "local-cluster[2,2,4096]"
os.environ["SPARK_EXECUTOR_MEMORY"] = "3072m"
sp = get_spark("lc-import-check", cpus=4, shuffle_partitions=4)
def f(it):
    from aopwiki_spark.media import decode_real  # executor-side import
    for pdf in it:
        yield pdf
n = sp.range(100).repartition(4).mapInPandas(f, "id long").count()
assert n == 100, n
print("LC_IMPORT_OK")
sp.stop()
"""


def test_executor_python_workers_import_engine():
    env = dict(os.environ)
    env.pop("SPARK_MASTER", None)
    env.pop("PYTHONPATH", None)  # the hook, not inherited env, must work
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(root=_ROOT)],
        capture_output=True, text=True, timeout=600, env=env, cwd=_ROOT)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "LC_IMPORT_OK" in out.stdout
