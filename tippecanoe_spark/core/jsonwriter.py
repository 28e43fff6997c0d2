"""Port of the reference's json_writer (write_json.cpp:18-240) —
byte-identical spacing quirks included (the goldens compare strings,
so the ``"  }"`` "accidental extra space" and nospace semantics matter).
"""

from __future__ import annotations

from .dtoa import dtoa_milo

_TOP = 0
_HASH = 1
_HASH_KEY = 2
_HASH_VALUE = 3
_ARRAY = 4
_ARRAY_ELEMENT = 5


class JsonWriter:
    def __init__(self):
        self.out = []
        self.state = []
        self.nospace = False
        self.wantnl = False

    def _adjust(self):
        st = self.state
        if not st:
            st.append(_TOP)
        elif st[-1] == _TOP:
            self.out.append("\n")
        elif st[-1] == _HASH:
            if not self.nospace:
                self.out.append(" ")
            self.nospace = False
            st[-1] = _HASH_KEY
        elif st[-1] == _HASH_KEY:
            self.out.append(": ")
            st[-1] = _HASH_VALUE
        elif st[-1] == _HASH_VALUE:
            if self.wantnl:
                self.out.append(",\n")
                self.nospace = False
            elif self.nospace:
                self.out.append(",")
                self.nospace = False
            else:
                self.out.append(", ")
            self.wantnl = False
            st[-1] = _HASH_KEY
        elif st[-1] == _ARRAY:
            if not self.nospace:
                self.out.append(" ")
            self.nospace = False
            st[-1] = _ARRAY_ELEMENT
        elif st[-1] == _ARRAY_ELEMENT:
            if self.wantnl:
                self.out.append(",\n")
                self.nospace = False
            elif self.nospace:
                self.out.append(",")
                self.nospace = False
            else:
                self.out.append(", ")
            self.wantnl = False

    def write_array(self):
        self._adjust()
        self.out.append("[")
        self.state.append(_ARRAY)

    def end_array(self):
        tok = self.state.pop()
        if not self.nospace:
            self.out.append(" ")
        self.nospace = False
        self.out.append("]")

    def write_hash(self):
        self._adjust()
        self.out.append("{")
        self.state.append(_HASH)

    def end_hash(self):
        tok = self.state.pop()
        if tok == _HASH:
            if not self.nospace:
                self.out.append("  ")  # preserved accidental extra space
            self.nospace = False
            self.out.append("}")
        else:
            if not self.nospace:
                self.out.append(" ")
            self.nospace = False
            self.out.append("}")

    def write_string(self, s: str):
        self._adjust()
        o = ['"']
        for c in s:
            if c in ('\\', '"'):
                o.append("\\" + c)
            elif ord(c) < ord(" "):
                o.append("\\u%04x" % ord(c))
            else:
                o.append(c)
        o.append('"')
        self.out.append("".join(o))

    def write_number(self, d: float):
        self._adjust()
        self.out.append(dtoa_milo(d))

    def write_float(self, d: float):
        self._adjust()
        self.out.append("%f" % d)

    def write_unsigned(self, v: int):
        self._adjust()
        self.out.append("%d" % v)

    def write_signed(self, v: int):
        self._adjust()
        self.out.append("%d" % v)

    def write_stringified(self, s: str):
        self._adjust()
        self.out.append(s)

    def write_bool(self, b: bool):
        self._adjust()
        self.out.append("true" if b else "false")

    def write_null(self):
        self._adjust()
        self.out.append("null")

    def write_newline(self):
        self.out.append("\n")
        self.nospace = True

    def comma(self):
        self.wantnl = True

    def getvalue(self) -> str:
        return "".join(self.out)
