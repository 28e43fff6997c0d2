"""UTF-8 validation (text.cpp:10-54): byte-level structural check of
attribute strings at import; invalid sequences are a fatal input error
in the reference (read_json.cpp:150-160)."""

from __future__ import annotations


def check_utf8(s: str) -> str:
    """Returns "" when valid, else the reference's error message.

    Python str may carry lone surrogates (from \\uDC00 escapes in JSON);
    encoding with surrogatepass yields the same byte patterns (0xED ...)
    the reference would see and reject as invalid continuation bytes of
    a 3-byte sequence -- the C check accepts any 3-byte shape, so
    surrogates actually PASS it; mirror that by validating shape only.
    """
    b = s.encode("utf-8", errors="surrogatepass")
    i = 0
    n = len(b)
    while i < n:
        c = b[i]
        fail = 0
        if c & 0x80 == 0x80:
            if c & 0xE0 == 0xC0:
                if i + 1 >= n or (b[i + 1] & 0xC0) != 0x80:
                    fail = 2
                else:
                    i += 1
            elif c & 0xF0 == 0xE0:
                if i + 2 >= n or (b[i + 1] & 0xC0) != 0x80 or (b[i + 2] & 0xC0) != 0x80:
                    fail = 3
                else:
                    i += 2
            elif c & 0xF8 == 0xF0:
                if i + 3 >= n or (b[i + 1] & 0xC0) != 0x80 or (b[i + 2] & 0xC0) != 0x80 \
                        or (b[i + 3] & 0xC0) != 0x80:
                    fail = 4
                else:
                    i += 3
            else:
                fail = 1
        if fail:
            parts = " ".join("0x%02X" % b[i + j] for j in range(fail) if i + j < n)
            return f'"{s}" is not valid UTF-8 ({parts})'
        i += 1
    return ""
