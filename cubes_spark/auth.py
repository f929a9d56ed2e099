"""Authorization: identity-based cube access and cell restriction.

Parity: /root/reference/cubes/auth.py (AccessRight 60-191,
SimpleAuthorizer 194-384): role inheritance with dependency-ordered
merging, allow/deny order semantics, `*` wildcard plus `prefix*` /
`*suffix` cube patterns, per-cube cell restrictions (appended as hidden
cuts) and hierarchy drilldown limits.

Restriction cells compile to ordinary cut predicates, so an authorized
browse costs the same plan with one extra pushed-down filter.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Iterable, List, Optional

from cubes_spark.errors import ConfigurationError, CubesError
from cubes_spark.query.cells import Cell, PointCut, cut_from_dict, \
    cut_from_string

__all__ = [
    "ALL_CUBES_WILDCARD",
    "AccessRight",
    "Authorizer",
    "NoopAuthorizer",
    "SimpleAuthorizer",
    "NotAuthorized",
]

ALL_CUBES_WILDCARD = "*"


class NotAuthorized(CubesError):
    """Raised when an unknown identity requests access."""


def _expand_patterns(names: Iterable[str]):
    exact, prefixes, suffixes = set(), [], []
    for name in names or []:
        if name == ALL_CUBES_WILDCARD:
            exact.add(name)
        elif name.endswith("*"):
            prefixes.append(name[:-1])
        elif name.startswith("*"):
            suffixes.append(name[1:])
        else:
            exact.add(name)
    return exact, prefixes, suffixes


class AccessRight:
    """One identity's (or role's) rights
    (parity: auth.py:60-191)."""

    def __init__(self, roles: Optional[Iterable] = None,
                 allowed_cubes: Optional[Iterable] = None,
                 denied_cubes: Optional[Iterable] = None,
                 cell_restrictions: Optional[dict] = None,
                 hierarchy_limits: Optional[dict] = None) -> None:
        self.roles = set(roles or [])
        self.allowed_cubes = set(allowed_cubes or [])
        self.denied_cubes = set(denied_cubes or [])
        self.cell_restrictions = dict(cell_restrictions or {})
        self.hierarchy_limits = dict(hierarchy_limits or {})
        self._refresh_patterns()

    def _refresh_patterns(self) -> None:
        """Precompute the wildcard pattern split (parity: the
        reference caches patterns per right, auth.py:126-140):
        authorize() over N cubes must not re-expand the same frozen
        sets N times per request."""
        self._allowed_patterns = _expand_patterns(self.allowed_cubes)
        self._denied_patterns = _expand_patterns(self.denied_cubes)

    def merge(self, other: "AccessRight") -> None:
        """Union cubes/roles; concatenate per-cube restrictions
        (parity: auth.py:100-124)."""
        self.roles |= other.roles
        self.allowed_cubes |= other.allowed_cubes
        self.denied_cubes |= other.denied_cubes
        self._refresh_patterns()
        for cube, restrictions in other.cell_restrictions.items():
            self.cell_restrictions.setdefault(cube, [])
            self.cell_restrictions[cube] = (
                self.cell_restrictions[cube] + list(restrictions)
                if self.cell_restrictions[cube] else list(restrictions)
            )
        for cube, limits in other.hierarchy_limits.items():
            self.hierarchy_limits.setdefault(cube, [])
            self.hierarchy_limits[cube] = (
                self.hierarchy_limits[cube] + list(limits)
                if self.hierarchy_limits[cube] else list(limits)
            )

    def is_allowed(self, name: str, allow_after_denied: bool = True) -> bool:
        """Allow/deny with wildcard patterns
        (parity: auth.py:126-165 — same four-case truth table)."""
        allowed, allowed_pre, allowed_suf = self._allowed_patterns
        denied, denied_pre, denied_suf = self._denied_patterns

        allow = False
        if self.allowed_cubes:
            allow = name in allowed or ALL_CUBES_WILDCARD in allowed
            allow = allow or any(name.startswith(p) for p in allowed_pre)
            allow = allow or any(name.endswith(s) for s in allowed_suf)

        deny = False
        if self.denied_cubes:
            deny = name in denied or ALL_CUBES_WILDCARD in denied
            deny = deny or any(name.startswith(p) for p in denied_pre)
            deny = deny or any(name.endswith(s) for s in denied_suf)

        if allow_after_denied:   # deny_allow
            return allow or not deny
        return allow and not deny  # allow_deny

    def to_dict(self) -> dict:
        return {
            "roles": sorted(self.roles),
            "allowed_cubes": sorted(self.allowed_cubes),
            "denied_cubes": sorted(self.denied_cubes),
            "cell_restrictions": self.cell_restrictions,
            "hierarchy_limits": self.hierarchy_limits,
        }

    @classmethod
    def from_dict(cls, info: dict) -> "AccessRight":
        return cls(
            roles=info.get("roles"),
            allowed_cubes=info.get("allowed_cubes"),
            denied_cubes=info.get("denied_cubes"),
            cell_restrictions=info.get("cell_restrictions"),
            hierarchy_limits=info.get("hierarchy_limits"),
        )


class Authorizer:
    def authorize(self, identity: Any, cubes: Iterable) -> list:
        raise NotImplementedError

    def restricted_cell(self, identity: Any, cube: Any,
                        cell: Optional[Cell] = None) -> Optional[Cell]:
        return cell

    def hierarchy_limits(self, identity: Any, cube: Any) -> list:
        return []


class NoopAuthorizer(Authorizer):
    """Everything allowed (parity: auth.py:50-57)."""

    def authorize(self, identity: Any, cubes: Iterable) -> list:
        return list(cubes)


def _sorted_role_order(deps: Dict[str, set]) -> List[str]:
    order: List[str] = []
    # an UNKNOWN parent must not masquerade as a cycle: treat it as
    # satisfied here so the merge loop reports it by name instead
    satisfied: set = {
        parent for parents in deps.values() for parent in parents
        if parent not in deps
    }
    pending = {k: set(v) for k, v in deps.items()}
    while pending:
        ready = sorted(k for k, v in pending.items() if v <= satisfied)
        if not ready:
            raise ConfigurationError(
                f"Circular role dependency among: {sorted(pending)}"
            )
        for k in ready:
            order.append(k)
            satisfied.add(k)
            del pending[k]
    return order


class SimpleAuthorizer(Authorizer):
    """Dictionary/JSON-file driven authorizer
    (parity: auth.py:194-384)."""

    def __init__(self, rights_file: Optional[str] = None,
                 roles_file: Optional[str] = None,
                 roles: Optional[dict] = None,
                 rights: Optional[dict] = None,
                 identity_dimension: Optional[str] = None,
                 order: Optional[str] = None,
                 guest: Optional[str] = None, **options: Any) -> None:
        roles = dict(roles or {})
        rights = dict(rights or {})
        if roles_file:
            with open(roles_file, encoding="utf-8") as f:
                roles.update(json.load(f))
        if rights_file:
            with open(rights_file, encoding="utf-8") as f:
                rights.update(json.load(f))

        self.guest = guest or None

        order = order or "deny_allow"
        if order == "allow_deny":
            self.allow_after_denied = False
        elif order == "deny_allow":
            self.allow_after_denied = True
        else:
            raise ConfigurationError(f"Unknown allow/deny order: {order}")

        # roles merge in dependency order (parity: auth.py:259-268)
        self.roles = {k: AccessRight.from_dict(v) for k, v in roles.items()}
        deps = {name: role.roles for name, role in self.roles.items()}
        for name in _sorted_role_order(deps):
            role = self.roles[name]
            # merge() unions parent.roles INTO role.roles — iterate a
            # snapshot or any inheritance chain of depth >= 2 dies
            # with 'set changed size during iteration'
            for parent in list(role.roles):
                try:
                    role.merge(self.roles[parent])
                except KeyError:
                    raise ConfigurationError(
                        f"Unknown role '{parent}' referenced from "
                        f"role '{name}'")

        self.rights = {}
        for key, info in rights.items():
            right = AccessRight.from_dict(info)
            for role_name in list(right.roles):
                try:
                    right.merge(self.roles[role_name])
                except KeyError:
                    raise ConfigurationError(
                        f"Unknown role '{role_name}' in right '{key}'"
                    )
            self.rights[key] = right

        if identity_dimension:
            from cubes_spark.query.drilldown import string_to_dimension_level

            if isinstance(identity_dimension, str):
                dim, hier, _ = string_to_dimension_level(identity_dimension)
            else:
                dim, hier = identity_dimension[:2]
            self.identity_dimension = dim
            self.identity_hierarchy = hier
        else:
            self.identity_dimension = None
            self.identity_hierarchy = None

    def right(self, identity: Any) -> AccessRight:
        try:
            return self.rights[identity]
        except KeyError:
            if self.guest and self.guest in self.roles:
                return self.roles[self.guest]
            raise NotAuthorized(f"Unknown access right '{identity}'")

    def authorize(self, identity: Any, cubes: Iterable) -> list:
        try:
            right = self.right(identity)
        except NotAuthorized:
            return []
        return [
            cube for cube in cubes
            if right.is_allowed(str(cube), self.allow_after_denied)
        ]

    def restricted_cell(self, identity: Any, cube: Any,
                        cell: Optional[Cell] = None) -> Cell:
        """Cell the identity is confined to: configured restriction cuts
        (hidden) + optional identity-dimension point cut, intersected
        with the requested cell (parity: auth.py:330-378)."""
        right = self.right(identity)

        cuts = list(right.cell_restrictions.get(cube.name, []))
        cuts += right.cell_restrictions.get(ALL_CUBES_WILDCARD, [])

        restriction_cuts = []
        for cut in cuts:
            if isinstance(cut, str):
                cut = cut_from_string(cut, cube)
            elif isinstance(cut, dict):
                cut = cut_from_dict(cut, cube)
            cut.hidden = True
            restriction_cuts.append(cut)
        restriction = Cell(cube, restriction_cuts)

        if self.identity_dimension:
            try:
                ident_dim = cube.dimension(self.identity_dimension)
            except Exception:
                ident_dim = None
            if ident_dim is not None:
                hier = ident_dim.hierarchy(self.identity_hierarchy)
                if len(hier.levels) != 1:
                    raise ConfigurationError(
                        f"Identity hierarchy has to be flat ({hier} in "
                        f"dimension {ident_dim} is not)"
                    )
                cut = PointCut(ident_dim, [identity],
                               hierarchy=self.identity_hierarchy, hidden=True)
                restriction = restriction & Cell(cube, [cut])

        if cell:
            return cell & restriction
        return restriction

    def hierarchy_limits(self, identity: Any, cube: Any) -> list:
        right = self.right(identity)
        return right.hierarchy_limits.get(str(cube), [])
