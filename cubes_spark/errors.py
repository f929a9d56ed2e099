"""Exception hierarchy (parity: /root/reference/cubes/errors.py)."""

from __future__ import annotations


class CubesError(Exception):
    """Base error for the engine."""


class UserError(CubesError):
    """Error caused by the user of the framework (query, model, config)."""

    error_type = "unknown_user_error"


class InternalError(CubesError):
    error_type = "internal_error"


class ConfigurationError(InternalError):
    pass


class ArgumentError(UserError):
    error_type = "argument"


class ModelError(UserError):
    error_type = "model"


class ModelInconsistencyError(ModelError):
    pass


class NoSuchDimensionError(ModelError):
    error_type = "no_such_dimension"

    def __init__(self, message=None, name=None):
        super().__init__(message or f"No such dimension: {name}")
        self.name = name


class NoSuchCubeError(ModelError):
    error_type = "no_such_cube"

    def __init__(self, message=None, name=None):
        super().__init__(message or f"No such cube: {name}")
        self.name = name


class NoSuchAttributeError(UserError):
    error_type = "attribute"


class ExpressionError(ModelError):
    """Raised on unknown function/variable or bad expression syntax."""

    error_type = "expression"


class HierarchyError(UserError):
    error_type = "hierarchy"


class MissingObjectError(UserError):
    error_type = "missing_object"

    def __init__(self, message=None, name=None):
        super().__init__(message or name)
        self.name = name


class BrowserError(UserError):
    error_type = "browser"


class StoreError(UserError):
    error_type = "store"


class BackendError(UserError):
    """A backend store/server failed to satisfy a request (parity:
    reference errors.py BackendError — raised e.g. by the remote
    Slicer store on a non-200/404 HTTP response)."""
    error_type = "backend"
