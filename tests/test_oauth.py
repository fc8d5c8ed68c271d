"""OAuth 1.0a layer (plans/oauth.py) — pure protocol, no Spark.

Covers the signature core against the canonical public OAuth 1.0 spec
test vector (RFC 5849 / original OAuth Core 1.0 Appendix A.5 example),
then the full BIGSdb token dance (request -> authorize -> access ->
session -> protected) with deterministic tokens and a fixed clock,
and every reference error path (OAuth.pm / REST/Interface.pm).
"""

from __future__ import annotations

import itertools

import pytest

from bigsdb_spark.plans.oauth import (
    ACCESS_TOKEN_TIMEOUT,
    REQUEST_TOKEN_EXPIRES,
    REQUEST_TOKEN_TIMEOUT,
    SESSION_EXPIRES,
    AuthStore,
    Client,
    OAuthError,
    get_access_token,
    get_request_token,
    get_session_token,
    normalize_url,
    oauth_escape,
    pick_oauth_params,
    sign_hmac_sha1,
    signature_base_string,
    verify_protected_request,
)

NOW = 1_700_000_000
URL = "https://rest.example.org/db/pubmlst_test/oauth/get_request_token"


# ------------------------------------------------------ signature core

def test_signature_base_string_spec_vector():
    """The classic photos.example.net vector from the public OAuth Core
    1.0 spec (Appendix A.5.1/A.5.2): known base string AND known
    HMAC-SHA1 signature."""
    params = {
        "oauth_consumer_key": "dpf43f3p2l4k3l03",
        "oauth_token": "nnch734d00sl2jdk",
        "oauth_signature_method": "HMAC-SHA1",
        "oauth_timestamp": "1191242096",
        "oauth_nonce": "kllo9940pd9333jh",
        "oauth_version": "1.0",
        "file": "vacation.jpg",
        "size": "original",
        "oauth_signature": "ignored-in-base-string",
    }
    base = signature_base_string(
        "GET", "http://photos.example.net/photos", params
    )
    assert base == (
        "GET&http%3A%2F%2Fphotos.example.net%2Fphotos&"
        "file%3Dvacation.jpg%26oauth_consumer_key%3Ddpf43f3p2l4k3l03%26"
        "oauth_nonce%3Dkllo9940pd9333jh%26oauth_signature_method%3DHMAC-SHA1"
        "%26oauth_timestamp%3D1191242096%26oauth_token%3Dnnch734d00sl2jdk"
        "%26oauth_version%3D1.0%26size%3Doriginal"
    )
    sig = sign_hmac_sha1(base, "kd94hf93k423kf44", "pfkkdhi9sl3r4s00")
    assert sig == "tR3+Ty81lMeYAr/Fid0kMTYa/WM="


def test_normalize_url_and_escape():
    assert (
        normalize_url("HTTP://Example.COM:80/r?q=1#f") == "http://example.com/r"
    )
    assert normalize_url("https://h:8443/p") == "https://h:8443/p"
    assert normalize_url("https://h:443/p") == "https://h/p"
    # RFC 3986 unreserved set only: space -> %20, ~ kept, utf-8 bytes
    assert oauth_escape("a b~é") == "a%20b~%C3%A9"


def test_pick_oauth_params_header_merge_and_post_signature():
    header = (
        'OAuth realm="x", oauth_consumer_key="ck", '
        'oauth_signature="abc%2B%2F%3D", oauth_nonce="n1", '
        'oauth_timestamp="5", oauth_signature_method="HMAC-SHA1"'
    )
    got = pick_oauth_params({}, auth_header=header, post=True)
    assert got["oauth_consumer_key"] == "ck"
    # POST signatures arrive %-encoded; the reference decodes =,+,/
    assert got["oauth_signature"] == "abc+/="
    # query params win over the header
    got2 = pick_oauth_params({"oauth_nonce": "q"}, auth_header=header)
    assert got2["oauth_nonce"] == "q"


# --------------------------------------------------------- flow helper

def make_store():
    counter = itertools.count(1)
    store = AuthStore(token_source=lambda: f"tok{next(counter):029d}")
    store.register_client(
        Client(
            client_id="ck1",
            client_secret="cs1",
            application="TestApp",
            version="2.0",
        )
    )
    return store


def signed(params, method, url, consumer_secret, token_secret=""):
    """Client-side signer (what a REST consumer library does)."""
    p = dict(params)
    p.setdefault("oauth_signature_method", "HMAC-SHA1")
    p.setdefault("oauth_version", "1.0")
    base = signature_base_string(method, url, p)
    p["oauth_signature"] = sign_hmac_sha1(base, consumer_secret, token_secret)
    return p


def base_params(nonce, ts=NOW):
    return {
        "oauth_consumer_key": "ck1",
        "oauth_nonce": nonce,
        "oauth_timestamp": str(ts),
    }


def run_full_flow(store):
    rt_params = dict(base_params("n-req"), oauth_callback="oob")
    rt = get_request_token(
        store, signed(rt_params, "GET", URL, "cs1"), "GET", URL, now=NOW
    )
    verifier = store.authorize_request_token(
        rt["oauth_token"], "alice", "pubmlst_test", now=NOW
    )
    at_params = dict(
        base_params("n-acc"),
        oauth_token=rt["oauth_token"],
        oauth_verifier=verifier,
    )
    at = get_access_token(
        store,
        signed(at_params, "GET", URL, "cs1", rt["oauth_token_secret"]),
        "GET",
        URL,
        now=NOW,
    )
    st_params = dict(base_params("n-sess"), oauth_token=at["oauth_token"])
    st = get_session_token(
        store,
        signed(st_params, "GET", URL, "cs1", at["oauth_token_secret"]),
        "GET",
        URL,
        now=NOW,
    )
    return rt, at, st


def test_three_legged_flow_and_protected_request():
    store = make_store()
    rt, at, st = run_full_flow(store)
    assert rt["oauth_callback_confirmed"] == "true"
    assert at["oauth_token"] != rt["oauth_token"]
    # protected resource: extra query params are part of the signature
    p = dict(
        base_params("n-prot"),
        oauth_token=st["oauth_token"],
        page="2",
        page_size="50",
    )
    res_url = "https://rest.example.org/db/pubmlst_test/isolates"
    ok = verify_protected_request(
        store,
        signed(p, "GET", res_url, "cs1", st["oauth_token_secret"]),
        "GET",
        res_url,
        dbase="pubmlst_test",
        now=NOW,
    )
    assert ok == {
        "username": "alice",
        "dbase": "pubmlst_test",
        "client_name": "TestApp version 2.0",
    }
    # tampering with a NON-oauth param breaks the signature (the
    # extra_params are signed — Interface.pm:536-541)
    tampered = dict(signed(p, "GET", res_url, "cs1", st["oauth_token_secret"]))
    tampered["page"] = "999"
    with pytest.raises(OAuthError, match="Signature verification failed"):
        verify_protected_request(
            store, tampered, "GET", res_url, dbase="pubmlst_test", now=NOW
        )


def test_request_token_error_paths():
    store = make_store()
    good = signed(
        dict(base_params("n1"), oauth_callback="oob"), "GET", URL, "cs1"
    )
    # no consumer key -> 403 (OAuth.pm:46-48)
    with pytest.raises(OAuthError, match="No consumer key") as e:
        get_request_token(
            store, {k: v for k, v in good.items() if k != "oauth_consumer_key"},
            "GET", URL, now=NOW,
        )
    assert e.value.status == 403
    # unknown client -> 403
    bad = dict(good, oauth_consumer_key="nope")
    with pytest.raises(OAuthError, match="Unrecognized client"):
        get_request_token(store, bad, "GET", URL, now=NOW)
    # missing required param -> 400 naming the parameter (OAuth.pm:60-62)
    nocb = signed(dict(base_params("n2")), "GET", URL, "cs1")
    with pytest.raises(
        OAuthError, match="Missing required parameter: oauth_callback"
    ) as e:
        get_request_token(store, nocb, "GET", URL, now=NOW)
    assert e.value.status == 400
    # bad signature -> 401
    forged = dict(good, oauth_signature="AAAA")
    with pytest.raises(OAuthError, match="Signature verification failed"):
        get_request_token(store, forged, "GET", URL, now=NOW)
    # stale timestamp -> 401 (REQUEST_TOKEN_TIMEOUT window)
    old = signed(
        dict(
            base_params("n3", ts=NOW - REQUEST_TOKEN_TIMEOUT - 1),
            oauth_callback="oob",
        ),
        "GET", URL, "cs1",
    )
    with pytest.raises(OAuthError, match="timestamp more than 600"):
        get_request_token(store, old, "GET", URL, now=NOW)
    # nonce+timestamp replay -> 401 (OAuth.pm:74-81)
    get_request_token(store, good, "GET", URL, now=NOW)
    replay = signed(
        dict(base_params("n1"), oauth_callback="oob"), "GET", URL, "cs1"
    )
    with pytest.raises(OAuthError, match="same nonce and timestamp"):
        get_request_token(store, replay, "GET", URL, now=NOW)


def test_access_token_error_paths():
    store = make_store()
    rt_params = dict(base_params("n-req"), oauth_callback="oob")
    rt = get_request_token(
        store, signed(rt_params, "GET", URL, "cs1"), "GET", URL, now=NOW
    )
    tok, sec = rt["oauth_token"], rt["oauth_token_secret"]

    def redeem(token, verifier, ts=NOW, nonce="n-a"):
        p = dict(
            base_params(nonce, ts=ts), oauth_token=token, oauth_verifier=verifier
        )
        return get_access_token(
            store, signed(p, "GET", URL, "cs1", sec), "GET", URL, now=NOW
        )

    # unauthorized token: no verifier stamped yet -> 401 invalid verifier
    with pytest.raises(OAuthError, match="Invalid verifier code"):
        redeem(tok, "whatever")
    verifier = store.authorize_request_token(tok, "bob", "db1", now=NOW)
    # unknown token -> 401 (OAuth.pm:117-119)
    with pytest.raises(OAuthError, match="Invalid request token"):
        redeem("missing", verifier)
    # wrong verifier -> 401
    with pytest.raises(OAuthError, match="Invalid verifier code"):
        redeem(tok, "wrong1234")
    at = redeem(tok, verifier)
    # double redemption -> 401 (OAuth.pm:123-125)
    with pytest.raises(OAuthError, match="already been redeemed"):
        redeem(tok, verifier, nonce="n-b")
    # redeeming replaced any prior access token for (client, user, db)
    assert len(store.access_tokens) == 1
    assert store.access_tokens[at["oauth_token"]].username == "bob"
    # expired request token -> 401 (OAuth.pm:126-128)
    rt2 = get_request_token(
        store,
        signed(
            dict(base_params("n-req2"), oauth_callback="oob"), "GET", URL, "cs1"
        ),
        "GET", URL, now=NOW,
    )
    store.authorize_request_token(rt2["oauth_token"], "bob", "db1", now=NOW)
    store.request_tokens[rt2["oauth_token"]].timestamp = (
        NOW - REQUEST_TOKEN_EXPIRES - 1
    )
    sec = rt2["oauth_token_secret"]
    v2 = store.request_tokens[rt2["oauth_token"]].verifier
    with pytest.raises(OAuthError, match="Request token has expired"):
        redeem(rt2["oauth_token"], v2, nonce="n-c")


def test_session_token_error_paths_and_expiry_sweep():
    store = make_store()
    _, at, st = run_full_flow(store)

    def ask(token, secret, nonce, ts=NOW):
        p = dict(base_params(nonce, ts=ts), oauth_token=token)
        return get_session_token(
            store, signed(p, "GET", URL, "cs1", secret), "GET", URL, now=NOW
        )

    # missing access token -> 403 (OAuth.pm:215-217)
    p = signed(dict(base_params("nx")), "GET", URL, "cs1")
    with pytest.raises(OAuthError, match="No access token submitted") as e:
        get_session_token(store, p, "GET", URL, now=NOW)
    assert e.value.status == 403
    # unknown access token -> 401
    with pytest.raises(OAuthError, match="Invalid access token"):
        ask("missing", "s", "ny")
    # nonce replay against api_sessions -> 401 (session used n-sess@NOW)
    with pytest.raises(OAuthError, match="same nonce and timestamp"):
        ask(at["oauth_token"], at["oauth_token_secret"], "n-sess")
    # stale timestamp -> 401 (ACCESS_TOKEN_TIMEOUT)
    with pytest.raises(OAuthError, match="timestamp more than 600"):
        ask(
            at["oauth_token"], at["oauth_token_secret"], "nz",
            ts=NOW - ACCESS_TOKEN_TIMEOUT - 1,
        )
    # old sessions are swept at issue time (SESSION_EXPIRES = 12 h)
    store.api_sessions[st["oauth_token"]].start_time = (
        NOW - SESSION_EXPIRES - 1
    )
    fresh = ask(at["oauth_token"], at["oauth_token_secret"], "n-new")
    assert st["oauth_token"] not in store.api_sessions
    assert fresh["oauth_token"] in store.api_sessions


def test_protected_request_client_authorization_matrix():
    """default allow/deny x per-db override (Interface.pm:576-599)."""
    store = make_store()
    _, _, st = run_full_flow(store)
    url = "https://rest.example.org/db/pubmlst_test/isolates"

    def check(dbase="pubmlst_test"):
        p = dict(base_params("n-p"), oauth_token=st["oauth_token"])
        return verify_protected_request(
            store,
            signed(p, "GET", url, "cs1", st["oauth_token_secret"]),
            "GET", url, dbase=dbase, now=NOW,
        )

    assert check()["username"] == "alice"  # default allow, no override
    store.set_client_permission("ck1", "pubmlst_test", authorize="deny")
    with pytest.raises(OAuthError, match="Client is unauthorized"):
        check()
    store.set_client_permission("ck1", "pubmlst_test", authorize="allow")
    assert check()["username"] == "alice"
    # default deny: only an explicit allow admits
    store.clients["ck1"].default_permission = "deny"
    assert check()["username"] == "alice"  # explicit allow stands
    store.client_permissions.pop(("ck1", "pubmlst_test"))
    with pytest.raises(OAuthError, match="Client is unauthorized"):
        check()
    # no consumer key -> 401 with the session-specific message
    with pytest.raises(OAuthError, match="Generate new session token"):
        verify_protected_request(
            store, {"oauth_token": st["oauth_token"]}, "GET", url,
            dbase="pubmlst_test", now=NOW,
        )
    # invalid session token -> 401
    store.clients["ck1"].default_permission = "allow"
    p = dict(base_params("n-q"), oauth_token="gone")
    with pytest.raises(OAuthError, match="Invalid session token"):
        verify_protected_request(
            store, signed(p, "GET", url, "cs1", "s"), "GET", url,
            dbase="pubmlst_test", now=NOW,
        )


def test_session_token_is_database_scoped():
    """A session minted for database A must NOT verify against database
    B (Interface.pm:533-535 dbase-consistency -> 401), even with a
    valid signature and an authorized client."""
    store = make_store()
    _, _, st = run_full_flow(store)  # session dbase = pubmlst_test
    url = "https://rest.example.org/db/pubmlst_other/isolates"
    p = dict(base_params("n-x"), oauth_token=st["oauth_token"])
    with pytest.raises(OAuthError, match="Invalid session token") as ei:
        verify_protected_request(
            store,
            signed(p, "GET", url, "cs1", st["oauth_token_secret"]),
            "GET", url, dbase="pubmlst_other", now=NOW,
        )
    assert ei.value.status == 401
    # and the same call against the minted dbase still succeeds
    url_ok = "https://rest.example.org/db/pubmlst_test/isolates"
    p2 = dict(base_params("n-y"), oauth_token=st["oauth_token"])
    ok = verify_protected_request(
        store,
        signed(p2, "GET", url_ok, "cs1", st["oauth_token_secret"]),
        "GET", url_ok, dbase="pubmlst_test", now=NOW,
    )
    assert ok["dbase"] == "pubmlst_test"


def test_non_numeric_timestamp_stays_in_oauth_error_taxonomy():
    """A correctly-signed request with a non-numeric oauth_timestamp
    must raise OAuthError (4xx), never a bare ValueError that a route
    adapter would surface as a 500."""
    store = make_store()
    bad_rt = signed(
        dict(base_params("n-t", ts="garbage"), oauth_callback="oob"),
        "GET", URL, "cs1",
    )
    with pytest.raises(OAuthError, match="Request timestamp") as ei:
        get_request_token(store, bad_rt, "GET", URL, now=NOW)
    assert ei.value.status == 401
    # same taxonomy on the session-token leg
    rt, at, _ = run_full_flow(store)
    st_params = dict(
        base_params("n-u", ts="NaN"), oauth_token=at["oauth_token"]
    )
    with pytest.raises(OAuthError, match="Request timestamp") as ei2:
        get_session_token(
            store,
            signed(st_params, "GET", URL, "cs1", at["oauth_token_secret"]),
            "GET", URL, now=NOW,
        )
    assert ei2.value.status == 401
