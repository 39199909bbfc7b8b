"""Shared HTTP transport seam — one resolver for every operator that
talks HTTP (the `http` filter, the `http_poller` input).

The sandbox has no network, so live HTTP is never the only path: each
caller accepts an inline ``responses`` snapshot ({url: body}, status
200), an injected ``transport`` callable (tests and authenticated
production clients), or ``transport='urllib'`` (stdlib, the live
default outside the sandbox — honors ``request_timeout`` and request
``headers``). Centralized here so the transports cannot drift between
operators (they briefly did: the filter honored request headers, the
poller did not).
"""

from __future__ import annotations

from typing import Callable

Transport = Callable[[str], tuple[int, dict, str]]


def resolve_transport(conf: dict, err: type[Exception] = ValueError,
                      who: str = "http") -> Transport:
    """conf → ``url -> (status, headers_dict, body_str)``. Raises
    ``err`` when no seam is configured or the transport is invalid."""
    responses = conf.get("responses")
    transport = conf.get("transport")
    if responses is None and transport is None:
        raise err(
            f"{who}: provide `responses` (snapshot dict), a `transport` "
            "callable, or transport='urllib' (live) — this sandbox has "
            "no network, so the seam is explicit"
        )
    if responses is not None:
        snap = {str(k): str(v) for k, v in responses.items()}

        def fetch(u: str):
            if u not in snap:
                raise KeyError(u)
            return 200, {}, snap[u]

        return fetch
    if transport == "urllib":
        timeout = float(conf.get("request_timeout", 10))
        req_headers = dict(conf.get("headers", {}))

        def fetch(u: str):
            import urllib.request

            req = urllib.request.Request(u, headers=req_headers)
            with urllib.request.urlopen(req, timeout=timeout) as r:
                return (r.status, dict(r.headers.items()),
                        r.read().decode("utf-8", errors="replace"))

        return fetch
    if callable(transport):
        return transport
    raise err(f"{who}: bad transport {transport!r}")
