"""Authorization semantics (parity: /root/reference/tests/test_auth.py
+ cubes/auth.py truth tables)."""

import pytest

from cubes_spark.auth import (
    AccessRight,
    NoopAuthorizer,
    NotAuthorized,
    SimpleAuthorizer,
)

RIGHTS = {
    "alice": {"allowed_cubes": ["sales", "fin_*"]},
    "bob": {"denied_cubes": ["sales"]},
    "carol": {"roles": ["analyst"], "denied_cubes": ["secret"]},
    "dave": {"allowed_cubes": ["*"]},
    "eve": {
        "allowed_cubes": ["sales"],
        "cell_restrictions": {"sales": ["returnflag:A"]},
    },
}

ROLES = {
    "base": {"allowed_cubes": ["public"]},
    "analyst": {"roles": ["base"], "allowed_cubes": ["sales", "fin_costs"]},
}

CUBES = ["sales", "fin_costs", "public", "secret"]


@pytest.fixture
def authz():
    return SimpleAuthorizer(rights=RIGHTS, roles=ROLES)


def test_allowed_and_prefix_wildcard():
    # allow_deny: only the allow list (with prefix wildcard) passes
    authz = SimpleAuthorizer(rights=RIGHTS, roles=ROLES, order="allow_deny")
    assert authz.authorize("alice", CUBES) == ["sales", "fin_costs"]


def test_deny_allow_is_permissive(authz):
    # reference truth table: deny_allow admits anything not denied,
    # even with an allow list present
    assert authz.authorize("alice", CUBES) == CUBES


def test_deny_allow_order_defaults_open(authz):
    # deny_allow: no allow list → everything except denied
    assert authz.authorize("bob", CUBES) == ["fin_costs", "public", "secret"]


def test_allow_deny_order_defaults_closed():
    authz = SimpleAuthorizer(rights=RIGHTS, roles=ROLES, order="allow_deny")
    assert authz.authorize("bob", CUBES) == []


def test_role_inheritance(authz):
    # carol: analyst → base (public) + analyst (sales, fin_costs) − secret
    assert authz.authorize("carol", CUBES) == ["sales", "fin_costs", "public"]


def test_wildcard_all(authz):
    assert authz.authorize("dave", CUBES) == CUBES


def test_unknown_identity(authz):
    assert authz.authorize("mallory", CUBES) == []
    with pytest.raises(NotAuthorized):
        authz.right("mallory")


def test_guest_role():
    authz = SimpleAuthorizer(rights=RIGHTS, roles=ROLES, guest="base",
                             order="allow_deny")
    assert authz.authorize("mallory", CUBES) == ["public"]


def test_restricted_cell_applied(tpch_browser, authz):
    authz = SimpleAuthorizer(rights=RIGHTS, roles=ROLES)
    cube = tpch_browser.cube
    cell = authz.restricted_cell("eve", cube)
    assert len(cell.cuts) == 1
    assert cell.cuts[0].hidden

    result = tpch_browser.aggregate(cell=cell, drilldown=["returnflag"],
                                    aggregates=["fact_count"])
    assert len(result.cells) == 1
    assert result.cells[0]["returnflag.returnflag"] == "A"


def test_restricted_cell_intersects_request(tpch_browser):
    from cubes_spark.query.cells import Cell, cuts_from_string

    authz = SimpleAuthorizer(rights=RIGHTS, roles=ROLES)
    cube = tpch_browser.cube
    request = Cell(cube, cuts_from_string(cube, "date:1995"))
    cell = authz.restricted_cell("eve", cube, request)
    assert len(cell.cuts) == 2

    restricted = tpch_browser.aggregate(cell=cell,
                                        aggregates=["fact_count"])
    unrestricted = tpch_browser.aggregate(cell="date:1995",
                                          aggregates=["fact_count"])
    assert 0 < restricted.summary["fact_count"] \
        < unrestricted.summary["fact_count"]


def test_access_right_merge():
    a = AccessRight(allowed_cubes=["x"],
                    cell_restrictions={"x": ["d:1"]})
    b = AccessRight(allowed_cubes=["y"],
                    cell_restrictions={"x": ["d:2"], "y": ["e:1"]})
    a.merge(b)
    assert a.allowed_cubes == {"x", "y"}
    assert a.cell_restrictions == {"x": ["d:1", "d:2"], "y": ["e:1"]}


def test_noop_authorizer():
    assert NoopAuthorizer().authorize("anyone", CUBES) == CUBES


class TestReviewRegressionsR6:
    def test_role_inheritance_chain(self):
        """Depth>=2 role chains merge without 'set changed size during
        iteration'."""
        from cubes_spark.auth import SimpleAuthorizer

        auth = SimpleAuthorizer(roles={
            "a": {"roles": ["b"]},
            "b": {"roles": ["c"]},
            "c": {"allowed_cubes": ["sales"]},
        }, rights={"alice": {"roles": ["a"]}}, order="allow_deny")
        assert auth.authorize("alice", ["sales", "other"]) == ["sales"]

    def test_unknown_parent_role_clear_error(self):
        import pytest as _pytest

        from cubes_spark.auth import SimpleAuthorizer
        from cubes_spark.errors import ConfigurationError

        with _pytest.raises(ConfigurationError, match="typo"):
            SimpleAuthorizer(roles={"a": {"roles": ["typo"]}})

    def test_pattern_cache_updates_on_merge(self):
        from cubes_spark.auth import AccessRight

        r = AccessRight(allowed_cubes=["sales"])
        assert r.is_allowed("sales", False)
        assert not r.is_allowed("web_traffic", False)
        r.merge(AccessRight(allowed_cubes=["web_*"]))
        assert r.is_allowed("web_traffic", False)
