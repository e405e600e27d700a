"""AWS Signature Version 4 request signing — pure Python, public spec
('Signing AWS API requests'). Shared by the jar-free S3 (`sources/s3.py`)
and Kinesis (`sources/kinesis.py`) clients; pinned against AWS's published
test vector in tests/test_s3_origin.py and re-verified server-side by the
test fakes, which recompute each request's signature with the shared secret
and reject mismatches."""
from __future__ import annotations

import datetime as _dt
import hashlib
import hmac
import urllib.parse
from typing import Optional


def _sha256_hex(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()


def _hmac(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode("utf-8"), hashlib.sha256).digest()


def sigv4_headers(
    method: str,
    url: str,
    payload: bytes,
    access_key: str,
    secret_key: str,
    region: str = "us-east-1",
    service: str = "s3",
    amz_date: Optional[str] = None,
    extra_headers: Optional[dict[str, str]] = None,
    sign_payload_header: bool = True,
) -> dict[str, str]:
    """Returns the headers to attach: x-amz-date, x-amz-content-sha256 (when
    ``sign_payload_header`` — required for S3, omitted by the generic AWS
    test vectors), any extra headers, and Authorization."""
    parts = urllib.parse.urlsplit(url)
    host = parts.netloc
    # the URL is already RFC3986-encoded by the caller; the canonical URI is
    # that encoded path verbatim (S3 single-encode rule — encoding again
    # would double-escape and break the signature)
    canonical_uri = parts.path or "/"
    # canonical query: split the RAW query on '&'/'=' (NOT parse_qsl, which
    # decodes '+' as a space — a literal '+' is legal in S3 keys and must
    # canonicalize as %2B, not %20), percent-decode each component, re-encode
    # with the SigV4 unreserved set, and sort by the ENCODED name/value pairs
    # per the spec (ADVICE r5)
    def _canon_kv(pair: str) -> tuple[str, str]:
        k, _, v = pair.partition("=")
        return (
            urllib.parse.quote(urllib.parse.unquote(k), safe="-_.~"),
            urllib.parse.quote(urllib.parse.unquote(v), safe="-_.~"),
        )

    pairs = [_canon_kv(p) for p in parts.query.split("&") if p]
    canonical_query = "&".join(f"{k}={v}" for k, v in sorted(pairs))
    now = amz_date or _dt.datetime.now(_dt.timezone.utc).strftime("%Y%m%dT%H%M%SZ")
    datestamp = now[:8]
    payload_hash = _sha256_hex(payload)
    headers = {"host": host, "x-amz-date": now}
    if sign_payload_header:
        headers["x-amz-content-sha256"] = payload_hash
    for k, v in (extra_headers or {}).items():
        headers[k.lower()] = v
    signed_names = sorted(headers)
    canonical_headers = "".join(f"{k}:{headers[k].strip()}\n" for k in signed_names)
    signed_headers = ";".join(signed_names)
    canonical_request = "\n".join(
        [method, canonical_uri, canonical_query, canonical_headers,
         signed_headers, payload_hash]
    )
    scope = f"{datestamp}/{region}/{service}/aws4_request"
    string_to_sign = "\n".join(
        ["AWS4-HMAC-SHA256", now, scope, _sha256_hex(canonical_request.encode())]
    )
    k = _hmac(("AWS4" + secret_key).encode(), datestamp)
    k = _hmac(k, region)
    k = _hmac(k, service)
    k = _hmac(k, "aws4_request")
    signature = hmac.new(k, string_to_sign.encode(), hashlib.sha256).hexdigest()
    out = {kk: vv for kk, vv in headers.items() if kk != "host"}
    out["Authorization"] = (
        f"AWS4-HMAC-SHA256 Credential={access_key}/{scope}, "
        f"SignedHeaders={signed_headers}, Signature={signature}"
    )
    return out
