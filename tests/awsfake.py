"""Shared test helper: server-side SigV4 recomputation for the fake AWS
endpoints (S3, Kinesis). The fakes call ``verify_sigv4`` on every request
with the shared secret and reject mismatches, so the client signer in
``functions/aws_sigv4.py`` is proven against an independent reimplementation
on each test request."""
from __future__ import annotations

import hashlib
import hmac
import re
import urllib.parse


def _sha256_hex(b: bytes) -> str:
    return hashlib.sha256(b).hexdigest()


def verify_sigv4(handler, payload: bytes, access_key: str, secret_key: str) -> bool:
    auth = handler.headers.get("Authorization", "")
    m = re.match(
        r"AWS4-HMAC-SHA256 Credential=([^/]+)/(\d{8})/([^/]+)/([^/]+)/aws4_request, "
        r"SignedHeaders=([^,]+), Signature=([0-9a-f]+)",
        auth,
    )
    if not m:
        return False
    access, datestamp, region, service, signed, signature = m.groups()
    if access != access_key:
        return False
    parts = urllib.parse.urlsplit(handler.path)
    q = urllib.parse.parse_qsl(parts.query, keep_blank_values=True)
    canonical_query = "&".join(
        f"{urllib.parse.quote(k, safe='-_.~')}={urllib.parse.quote(v, safe='-_.~')}"
        for k, v in sorted(q)
    )
    names = signed.split(";")
    canonical_headers = "".join(
        f"{n}:{(handler.headers.get(n) or '').strip()}\n" for n in names
    )
    canonical_request = "\n".join(
        [
            handler.command,
            parts.path or "/",
            canonical_query,
            canonical_headers,
            signed,
            _sha256_hex(payload),
        ]
    )
    amz_date = handler.headers.get("x-amz-date", "")
    scope = f"{datestamp}/{region}/{service}/aws4_request"
    sts = "\n".join(
        ["AWS4-HMAC-SHA256", amz_date, scope, _sha256_hex(canonical_request.encode())]
    )
    k = hmac.new(
        ("AWS4" + secret_key).encode(), datestamp.encode(), hashlib.sha256
    ).digest()
    for part in (region, service, "aws4_request"):
        k = hmac.new(k, part.encode(), hashlib.sha256).digest()
    expect = hmac.new(k, sts.encode(), hashlib.sha256).hexdigest()
    return hmac.compare_digest(expect, signature)
