"""Data sources and the workspace/model registry."""

from cubes_spark.sources.workspace import Workspace, ParquetStore, read_model

__all__ = ["ParquetStore", "Workspace", "read_model"]
