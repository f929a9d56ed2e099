"""PySpark worker daemon that PRELOADS the heavy Python libraries.

Every forked Python worker otherwise imports numpy / pandas / pyarrow
from scratch on its first Arrow batch (~0.4-0.5 s of pure import time
per worker, paid once per executor core per session) — measured as
the dominant cost of small Arrow stages: a 32-core local session
spends ~15 s of executor time spinning workers for a stage whose
actual compute is milliseconds.  Importing the libraries in the
DAEMON, before it forks, lets every worker inherit the loaded modules
through copy-on-write for free (guide §4.5: initialise heavyweight
state once per task — here, once per MACHINE).

Wire-up: ``spark.python.daemon.module = cubes_spark.pydaemon`` (set by
``cubes_spark.sources.workspace.default_session`` and the bench/tool
session builders).  Fork-safety: none of these imports starts threads
or opens descriptors at import time, which is the requirement for
pre-fork loading.
"""

try:  # the daemon must come up even on a stripped executor image
    import numpy  # noqa: F401
    import pandas  # noqa: F401
    import pyarrow  # noqa: F401
    import pyarrow.pandas_compat  # noqa: F401  (lazy-loaded otherwise)
except ImportError:  # pragma: no cover
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
