"""OAuth 1.0a authentication layer for the REST surface.

Closes the one reference REST route module previously without a
counterpart (lib/BIGSdb/REST/Routes/OAuth.pm; verification plumbing in
REST/Interface.pm:465-633 get_oauth_params/_is_oauth_authorized/
delete_old_sessions; the web-UI authorization leg in
AuthorizeClientPage.pm:133-146 _authorize_token; tables in
sql/auth.sql).  Everything here is pure public protocol — RFC 5849
(HMAC-SHA1 signature base strings, three-legged token exchange) plus
the reference's extra SESSION-token leg and its replay/expiry windows.

Architecture note: the auth store is dimension-sized by reference
design (the auth_db Postgres tables — clients, request_tokens,
access_tokens, api_sessions — hold thousands of rows, not data-plane
rows), so it lives driver-side as plain objects with an injectable
token source and clock; the 100 TB data plane never touches it.  Route
handlers follow the plans/rest.py idiom: plain functions that raise
typed errors carrying the reference's HTTP status and message.

Flow (client perspective):
  1. GET /oauth/get_request_token  (signed with consumer secret only)
  2. user authorizes in the web UI -> verifier code
     (``AuthStore.authorize_request_token`` models that leg)
  3. GET /oauth/get_access_token   (signed with consumer+request secrets)
  4. GET /oauth/get_session_token  (signed with consumer+access secrets)
  5. protected requests            (signed with consumer+session secrets)
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import secrets
import time as _time
from dataclasses import dataclass, field
from typing import Callable
from urllib.parse import quote, urlsplit

# Windows/expiries — OAuth.pm:26-28 and REST/Interface.pm:53.
REQUEST_TOKEN_EXPIRES = 3600
REQUEST_TOKEN_TIMEOUT = 600
ACCESS_TOKEN_TIMEOUT = 600
SESSION_EXPIRES = 3600 * 12


class OAuthError(ValueError):
    """Typed route error: ``status`` is the HTTP code the reference
    sends via Dancer2 send_error."""

    def __init__(self, status: int, message: str):
        super().__init__(message)
        self.status = status


# --------------------------------------------------- RFC 5849 signing

def oauth_escape(value) -> str:
    """Percent-encoding per RFC 5849 §3.6 (RFC 3986 unreserved set)."""
    return quote(str(value), safe="-._~")


def normalize_url(url: str) -> str:
    """RFC 5849 §3.4.1.2: lowercase scheme/host, strip default ports
    and the query/fragment, keep the path."""
    parts = urlsplit(url)
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    port = parts.port
    if port and not (
        (scheme == "http" and port == 80) or (scheme == "https" and port == 443)
    ):
        host = f"{host}:{port}"
    return f"{scheme}://{host}{parts.path or '/'}"


def signature_base_string(method: str, url: str, params: dict) -> str:
    """RFC 5849 §3.4.1: METHOD & enc(normalized url) & enc(sorted
    k=v params).  ``params`` is every request parameter (query + oauth,
    the reference passes extra query params through Net::OAuth's
    extra_params) except ``oauth_signature`` and ``realm``."""
    pairs = sorted(
        (oauth_escape(k), oauth_escape(v))
        for k, v in params.items()
        if k not in ("oauth_signature", "realm")
    )
    param_str = "&".join(f"{k}={v}" for k, v in pairs)
    return "&".join(
        (method.upper(), oauth_escape(normalize_url(url)), oauth_escape(param_str))
    )


def sign_hmac_sha1(
    base_string: str, consumer_secret: str, token_secret: str = ""
) -> str:
    key = f"{oauth_escape(consumer_secret)}&{oauth_escape(token_secret)}"
    digest = hmac.new(
        key.encode(), base_string.encode(), hashlib.sha1
    ).digest()
    return base64.b64encode(digest).decode()


def verify_signature(
    params: dict,
    method: str,
    url: str,
    consumer_secret: str,
    token_secret: str = "",
) -> bool:
    base = signature_base_string(method, url, params)
    expected = sign_hmac_sha1(base, consumer_secret, token_secret)
    return hmac.compare_digest(expected, str(params.get("oauth_signature", "")))


# --------------------------------------------------------- auth store

@dataclass
class Client:
    client_id: str
    client_secret: str
    application: str = ""
    version: str = ""
    default_permission: str = "allow"  # auth.sql c_default_permission

    @property
    def name(self) -> str:
        # OAuth.pm _get_client: application [+ " version X"]
        if self.version:
            return f"{self.application} version {self.version}"
        return self.application


@dataclass
class RequestToken:
    token: str
    secret: str
    client_id: str
    nonce: str
    timestamp: int
    start_time: int
    username: str | None = None
    dbase: str | None = None
    verifier: str | None = None
    redeemed: bool = False


@dataclass
class AccessToken:
    token: str
    secret: str
    client_id: str
    username: str
    dbase: str
    datestamp: int = 0


@dataclass
class Session:
    session: str
    secret: str
    client_id: str
    username: str
    dbase: str
    nonce: str
    timestamp: int
    start_time: int


@dataclass
class AuthStore:
    """The auth_db tables (sql/auth.sql) as driver-side state.
    ``token_source`` is injectable so tests are deterministic
    (reference: BIGSdb::Utils::random_string(32))."""

    clients: dict = field(default_factory=dict)
    request_tokens: dict = field(default_factory=dict)
    access_tokens: dict = field(default_factory=dict)
    api_sessions: dict = field(default_factory=dict)
    # (client_id, dbase) -> {'authorize'|'submission'|'curation': 'allow'|'deny'}
    client_permissions: dict = field(default_factory=dict)
    token_source: Callable[[], str] = field(
        default_factory=lambda: (lambda: secrets.token_hex(16))
    )

    def register_client(self, client: Client) -> None:
        self.clients[client.client_id] = client

    def set_client_permission(
        self, client_id: str, dbase: str, **perms: str
    ) -> None:
        self.client_permissions.setdefault((client_id, dbase), {}).update(perms)

    def authorize_request_token(
        self, token: str, username: str, dbase: str, now: int | None = None
    ) -> str:
        """The web-UI leg (AuthorizeClientPage.pm:133-146): the signed-in
        user approves the client, which stamps (username, dbase,
        verifier) onto the request token, resets its clock, and shows
        the 8-char verifier for the client to redeem."""
        now = int(_time.time()) if now is None else now
        rt = self.request_tokens.get(token)
        if rt is None:
            raise OAuthError(400, "Token could not be authorized.")
        verifier = self.token_source()[:8]
        rt.username, rt.dbase, rt.verifier = username, dbase, verifier
        rt.start_time = now
        return verifier

    def prune_request_tokens(self, now: int) -> None:
        # OAuth.pm:87: DELETE FROM request_tokens WHERE start_time<?
        cutoff = now - REQUEST_TOKEN_EXPIRES
        self.request_tokens = {
            t: rt for t, rt in self.request_tokens.items()
            if rt.start_time >= cutoff
        }

    def delete_old_sessions(self, now: int) -> None:
        # REST/Interface.pm:623-633
        cutoff = now - SESSION_EXPIRES
        self.api_sessions = {
            s: sess for s, sess in self.api_sessions.items()
            if sess.start_time >= cutoff
        }


# ------------------------------------------------------ param plumbing

_BASE_PARAMS = (
    "oauth_consumer_key",
    "oauth_signature",
    "oauth_signature_method",
    "oauth_timestamp",
    "oauth_nonce",
)


def pick_oauth_params(
    params: dict,
    auth_header: str | None = None,
    token: bool = False,
    callback: bool = False,
    verifier: bool = False,
    post: bool = False,
) -> dict:
    """REST/Interface.pm:465-502 get_oauth_params: merge the
    Authorization header's quoted ``oauth_*`` pairs under the query
    params, and undo the client-side %-encoding of base64 signature
    chars on POST."""
    header: dict = {}
    if auth_header:
        for part in auth_header.split(","):
            k, _, v = part.strip().partition("=")
            if k.startswith("oauth"):
                header[k] = v.strip().strip('"')
    wanted = list(_BASE_PARAMS) + ["oauth_version"]
    if token:
        wanted.append("oauth_token")
    if callback:
        wanted.append("oauth_callback")
    if verifier:
        wanted.append("oauth_verifier")
    out = {}
    for name in wanted:
        val = params.get(name) or header.get(name)
        if val is not None:
            out[name] = val
    sig = out.get("oauth_signature")
    if post and header.get("oauth_signature") and sig:
        out["oauth_signature"] = (
            sig.replace("%3D", "=").replace("%2B", "+").replace("%2F", "/")
        )
    return out


def _require(oauth_params: dict, names: tuple, dot: bool = False) -> None:
    """Net::OAuth dies 'Missing required parameter ...' -> the reference
    regexes the name out and sends a 400 (OAuth.pm:60-65)."""
    suffix = "." if dot else ""
    for name in names:
        if not oauth_params.get(name):
            raise OAuthError(
                400,
                f"Invalid token request. Missing required parameter: {name}{suffix}",
            )
    sm = oauth_params.get("oauth_signature_method")
    if sm != "HMAC-SHA1":
        raise OAuthError(400, "Invalid token request" + suffix)


def _parse_timestamp(oauth_params: dict, timeout: int) -> int:
    """A correctly-signed request can still carry a non-numeric
    oauth_timestamp; keep that inside the OAuthError taxonomy (a route
    adapter maps .status) instead of letting int() raise a bare
    ValueError that would surface as a 500 where the reference's CGI
    numeric coercion yields a 4xx."""
    try:
        return int(oauth_params["oauth_timestamp"])
    except (ValueError, TypeError):
        raise OAuthError(
            401,
            f"Request timestamp more than {timeout} seconds "
            "from current time.",
        ) from None


def _get_client(store: AuthStore, oauth_params: dict) -> Client:
    client = store.clients.get(oauth_params.get("oauth_consumer_key"))
    if client is None or not client.client_secret:
        raise OAuthError(403, "Unrecognized client")
    return client


def _verify_or_401(
    oauth_params: dict,
    extra_params: dict,
    method: str,
    url: str,
    consumer_secret: str,
    token_secret: str = "",
    dot: bool = False,
) -> None:
    signed = dict(extra_params)
    signed.update(oauth_params)
    if not verify_signature(signed, method, url, consumer_secret, token_secret):
        raise OAuthError(401, "Signature verification failed" + ("." if dot else ""))


# -------------------------------------------------------------- routes

def get_request_token(
    store: AuthStore,
    params: dict,
    method: str,
    url: str,
    now: int | None = None,
    auth_header: str | None = None,
) -> dict:
    """GET /db/:db/oauth/get_request_token (OAuth.pm:40-100)."""
    now = int(_time.time()) if now is None else now
    op = pick_oauth_params(
        params, auth_header, callback=True, post=method.upper() == "POST"
    )
    if not op.get("oauth_consumer_key"):
        raise OAuthError(403, "No consumer key submitted")
    client = _get_client(store, op)
    _require(op, _BASE_PARAMS + ("oauth_callback",))
    _verify_or_401(op, {}, method, url, client.client_secret)
    ts = _parse_timestamp(op, REQUEST_TOKEN_TIMEOUT)
    if abs(ts - now) > REQUEST_TOKEN_TIMEOUT:
        raise OAuthError(
            401,
            f"Request timestamp more than {REQUEST_TOKEN_TIMEOUT} seconds "
            "from current time.",
        )
    nonce = op["oauth_nonce"]
    if any(
        rt.nonce == nonce and rt.timestamp == ts
        for rt in store.request_tokens.values()
    ):
        raise OAuthError(401, "Request with same nonce and timestamp already made")
    store.prune_request_tokens(now)
    token, secret = store.token_source(), store.token_source()
    store.request_tokens[token] = RequestToken(
        token=token,
        secret=secret,
        client_id=op["oauth_consumer_key"],
        nonce=nonce,
        timestamp=ts,
        start_time=now,
    )
    return {
        "oauth_token": token,
        "oauth_token_secret": secret,
        "oauth_callback_confirmed": "true",
    }


def get_access_token(
    store: AuthStore,
    params: dict,
    method: str,
    url: str,
    now: int | None = None,
    auth_header: str | None = None,
) -> dict:
    """GET /db/:db/oauth/get_access_token (OAuth.pm:102-184)."""
    now = int(_time.time()) if now is None else now
    op = pick_oauth_params(
        params, auth_header, token=True, verifier=True,
        post=method.upper() == "POST",
    )
    if not op.get("oauth_consumer_key"):
        raise OAuthError(403, "No consumer key submitted")
    client = _get_client(store, op)
    rt = store.request_tokens.get(op.get("oauth_token", ""))
    if rt is None or not rt.secret:
        raise OAuthError(
            401,
            "Invalid request token.  Generate new request token "
            "(/get_request_token).",
        )
    if not rt.verifier or rt.verifier != op.get("oauth_verifier"):
        raise OAuthError(401, "Invalid verifier code.")
    if rt.redeemed:
        raise OAuthError(
            401,
            "Request token has already been redeemed.  Generate new request "
            "token (/get_request_token).",
        )
    if abs(rt.timestamp - now) > REQUEST_TOKEN_EXPIRES:
        raise OAuthError(
            401,
            "Request token has expired.  Generate new request token "
            "(/get_request_token).",
        )
    _require(op, _BASE_PARAMS + ("oauth_token", "oauth_verifier"), dot=True)
    _verify_or_401(op, {}, method, url, client.client_secret, rt.secret, dot=True)
    rt.redeemed = True
    # Replace existing access token for the same (client, user, dbase).
    store.access_tokens = {
        t: at for t, at in store.access_tokens.items()
        if (at.client_id, at.username, at.dbase)
        != (rt.client_id, rt.username, rt.dbase)
    }
    token, secret = store.token_source(), store.token_source()
    store.access_tokens[token] = AccessToken(
        token=token,
        secret=secret,
        client_id=op["oauth_consumer_key"],
        username=rt.username or "",
        dbase=rt.dbase or "",
        datestamp=now,
    )
    return {"oauth_token": token, "oauth_token_secret": secret}


def get_session_token(
    store: AuthStore,
    params: dict,
    method: str,
    url: str,
    now: int | None = None,
    auth_header: str | None = None,
) -> dict:
    """GET /db/:db/oauth/get_session_token (OAuth.pm:204-293)."""
    now = int(_time.time()) if now is None else now
    op = pick_oauth_params(
        params, auth_header, token=True, post=method.upper() == "POST"
    )
    if not op.get("oauth_consumer_key"):
        raise OAuthError(403, "No consumer key submitted")
    if not op.get("oauth_token"):
        raise OAuthError(403, "No access token submitted")
    client = _get_client(store, op)
    at = store.access_tokens.get(op["oauth_token"])
    if at is None or not at.secret:
        raise OAuthError(
            401,
            "Invalid access token.  Generate new access token "
            "(/get_access_token).",
        )
    _require(op, _BASE_PARAMS + ("oauth_token",), dot=True)
    _verify_or_401(op, {}, method, url, client.client_secret, at.secret, dot=True)
    ts = _parse_timestamp(op, ACCESS_TOKEN_TIMEOUT)
    nonce = op["oauth_nonce"]
    if any(
        s.nonce == nonce and s.timestamp == ts
        for s in store.api_sessions.values()
    ):
        raise OAuthError(401, "Request with same nonce and timestamp already made")
    if abs(ts - now) > ACCESS_TOKEN_TIMEOUT:
        raise OAuthError(
            401,
            f"Request timestamp more than {ACCESS_TOKEN_TIMEOUT} seconds "
            "from current time.",
        )
    store.delete_old_sessions(now)
    token, secret = store.token_source(), store.token_source()
    store.api_sessions[token] = Session(
        session=token,
        secret=secret,
        client_id=op["oauth_consumer_key"],
        username=at.username,
        dbase=at.dbase,
        nonce=nonce,
        timestamp=ts,
        start_time=now,
    )
    return {"oauth_token": token, "oauth_token_secret": secret}


def verify_protected_request(
    store: AuthStore,
    params: dict,
    method: str,
    url: str,
    dbase: str,
    now: int | None = None,
    auth_header: str | None = None,
) -> dict:
    """Per-request session auth for every protected route
    (REST/Interface.pm:503-566 _is_oauth_authorized +
    _check_client_authorization).  ``params`` carries the FULL query —
    non-oauth params are part of the signature (extra_params).  Returns
    {username, dbase, client_name} on success.

    A session token is database-scoped: a token minted for database A
    is rejected (401) against database B, mirroring the reference's
    dbase-consistency check (Interface.pm:533-535,
    get_dbname_with_user_details ne session dbase -> 401).  The
    reference's per-user authorization leg (_check_user_authorization:
    user-account existence/status in the target database) is out of
    scope here — callers owning a user registry must perform that check
    on the returned ``username`` themselves."""
    now = int(_time.time()) if now is None else now
    op = pick_oauth_params(
        params, auth_header, token=True, post=method.upper() == "POST"
    )
    if not op.get("oauth_consumer_key"):
        raise OAuthError(401, "Unauthorized - Generate new session token.")
    client = _get_client(store, op)
    store.delete_old_sessions(now)
    sess = store.api_sessions.get(op.get("oauth_token", ""))
    if sess is None or not sess.secret:
        raise OAuthError(
            401,
            "Invalid session token.  Generate new token (/get_session_token).",
        )
    if sess.dbase != dbase:
        # Interface.pm:533-535: session dbase must match the request's
        # database — otherwise a token minted for A verifies for B.
        raise OAuthError(
            401,
            "Invalid session token.  Generate new token (/get_session_token).",
        )
    extra = {
        k: v for k, v in params.items() if not k.startswith("oauth_")
    }
    _require(op, _BASE_PARAMS + ("oauth_token",), dot=True)
    _verify_or_401(
        op, extra, method, url, client.client_secret, sess.secret, dot=True
    )
    # client authorization: default allow/deny + per-dbase override
    # (REST/Interface.pm:576-599 _check_client_authorization)
    override = store.client_permissions.get(
        (client.client_id, dbase), {}
    ).get("authorize")
    if client.default_permission == "allow":
        authorized = override is None or override == "allow"
    else:
        authorized = override is not None and override != "deny"
    if not authorized:
        raise OAuthError(401, "Client is unauthorized to access this database.")
    return {
        "username": sess.username,
        "dbase": sess.dbase,
        "client_name": client.name,
    }
