"""Slicer-compatible HTTP server (Flask).

Parity: /root/reference/cubes/server/blueprint.py:228-607 — the same
JSON API surface over the Spark-backed workspace.
"""

from cubes_spark.server.app import create_server, slicer_blueprint

__all__ = ["create_server", "slicer_blueprint"]
