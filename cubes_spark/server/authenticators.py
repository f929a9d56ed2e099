"""Authentication — WHO the caller is, separate from authorization.

Parity: /root/reference/cubes/server/auth.py:18-90 (Authenticator,
PassParameterAuthenticator, HTTPBasicProxyAuthenticator,
AdminAdminAuthenticator).  The reference treats authentication as a
pluggable step that yields an *identity*, which the Authorizer then
maps to rights; this module restores that separation.

SECURITY NOTE — the default ``PassParameterAuthenticator`` trusts the
client-supplied ``?identity=`` parameter / ``X-Identity`` header
verbatim (exactly like the reference's permissive ``pass_parameter``
method).  With it, authorization is ADVISORY: any caller can claim any
identity.  Deploy with ``HTTPBasicProxyAuthenticator`` behind an
authenticating reverse proxy (or implement a real ``Authenticator``)
whenever the authorizer is used for actual access control.
"""

from __future__ import annotations

from typing import Any, Optional

from cubes_spark.errors import ConfigurationError, CubesError

__all__ = [
    "NotAuthenticated",
    "Authenticator",
    "NoneAuthenticator",
    "PassParameterAuthenticator",
    "HTTPBasicProxyAuthenticator",
    "AdminAdminAuthenticator",
    "create_authenticator",
]


class NotAuthenticated(CubesError):
    """No acceptable credentials in the request (HTTP 401)."""


class Authenticator:
    """Yields the request's identity, or raises NotAuthenticated."""

    def authenticate(self, request: Any) -> Optional[str]:
        raise NotImplementedError

    def logout(self, request: Any, identity: Optional[str]) -> Any:
        """Response ending the session (parity: reference
        server/auth.py:25-26; basic-auth variants override to force a
        credential re-prompt)."""
        return "logged out"

    def info_dict(self, request: Any) -> dict:
        return {"username": self.authenticate(request)}


class NoneAuthenticator(Authenticator):
    """Anonymous: every request authenticates as identity ``None``.
    Client-supplied identity hints are IGNORED — combine with an
    authorizer ``guest`` right for public read-only deployments."""

    def authenticate(self, request: Any) -> Optional[str]:
        return None


class PassParameterAuthenticator(Authenticator):
    """Permissive: identity comes from a URL parameter (default
    ``identity``, reference default ``api_key``) or the ``X-Identity``
    header.  TRUSTS THE CLIENT — see module security note.
    (parity: server/auth.py:61-69)"""

    def __init__(self, parameter: Optional[str] = None, **options: Any):
        self.parameter_name = parameter or "identity"

    def authenticate(self, request: Any) -> Optional[str]:
        return (request.args.get(self.parameter_name)
                or request.headers.get("X-Identity"))


def _basic_auth_logout(realm: str, request: Any) -> Any:
    """401 + WWW-Authenticate: the only portable way to make a browser
    forget HTTP Basic credentials (parity: server/auth.py:34-42)."""
    from flask import Response

    return Response("logged out", status=401,
                    headers={"WWW-Authenticate":
                             f'Basic realm="{realm}"'})


class HTTPBasicProxyAuthenticator(Authenticator):
    """Assumes an authenticating reverse proxy already verified HTTP
    Basic credentials; passes the username through as identity without
    checking the password (parity: server/auth.py:72-90).  Falls back
    to a trusted forwarded-user header (default ``X-Forwarded-User``)
    for proxies that strip the Authorization header."""

    def __init__(self, realm: Optional[str] = None,
                 header: Optional[str] = None, **options: Any):
        self.realm = realm or "Default"
        self.header = header or "X-Forwarded-User"

    def logout(self, request: Any, identity: Optional[str]) -> Any:
        return _basic_auth_logout(self.realm, request)

    def authenticate(self, request: Any) -> str:
        auth = request.authorization
        if auth and auth.username:
            return auth.username
        forwarded = request.headers.get(self.header)
        if forwarded:
            return forwarded
        raise NotAuthenticated(
            f"HTTP Basic credentials required (realm '{self.realm}')"
        )


class AdminAdminAuthenticator(Authenticator):
    """Testing only: HTTP Basic where username == password
    (parity: server/auth.py:44-58)."""

    def __init__(self, realm: Optional[str] = None, **options: Any):
        self.realm = realm or "Default"

    def logout(self, request: Any, identity: Optional[str]) -> Any:
        return _basic_auth_logout(self.realm, request)

    def authenticate(self, request: Any) -> str:
        auth = request.authorization
        if auth and auth.username and auth.username == auth.password:
            return auth.username
        raise NotAuthenticated(
            f"HTTP Basic same-username-password required "
            f"(realm '{self.realm}')"
        )


_METHODS = {
    "none": NoneAuthenticator,
    "pass_parameter": PassParameterAuthenticator,
    "http_basic_proxy": HTTPBasicProxyAuthenticator,
    "admin_admin": AdminAdminAuthenticator,
}


def create_authenticator(method: Optional[str] = None,
                         **options: Any) -> Authenticator:
    """Authenticator from a config ``method`` name (the reference's
    ``[server] authentication =`` option)."""
    if method is None or isinstance(method, Authenticator):
        return method or PassParameterAuthenticator()
    try:
        cls = _METHODS[method]
    except KeyError:
        # cubes_spark.authenticator entry points (parity: reference
        # ext.py authenticator finder feeding [server] authentication)
        from cubes_spark import ext
        from cubes_spark.errors import InternalError

        try:
            return ext.authenticator.create(method, **options)
        except InternalError:
            raise ConfigurationError(
                f"Unknown authentication method '{method}' "
                f"(expected one of {sorted(_METHODS)} or a "
                f"cubes_spark.authenticator entry point)"
            )
    return cls(**options)
