"""Stdlib wire-protocol clients for the service connectors whose
protocols are simple, public, and fully specified: Redis (RESP2,
https://redis.io/docs/reference/protocol-spec), MongoDB (OP_MSG
framing over BSON, the MongoDB Wire Protocol + the public BSON spec,
bsonspec.org), and MQTT 3.1.1 (the OASIS standard's fixed-header +
remaining-length framing).

Why these exist: the reference delegates to the ``redis`` / ``pymongo``
/ mongo-spark / ``paho-mqtt`` packages (reference readers.py:3238-3418).
None of those drivers ship in this environment, which left the readers
import-gated and only injectable-mock-tested. Each protocol is a few
hundred lines of framing, so the readers get a native stdlib path
instead — testable against a loopback socket server speaking REAL
protocol bytes (tests/test_wire_protocols.py), and usable against real
servers where unauthenticated access is allowed.

Scope (deliberate): RESP2 request/response only (no pub/sub, no RESP3
push types); OP_MSG section kind 0 only (no OP_COMPRESSED, no
checksums, no SCRAM auth); MQTT QoS 0/1 subscribe/receive only (no
QoS 2 PUBREC/PUBREL, no TLS) — an authenticated deployment still needs
the real driver, and the readers say so loudly.
"""

from __future__ import annotations

import socket
import struct

# --------------------------------------------------------------------------
# RESP2 (Redis serialization protocol)
# --------------------------------------------------------------------------


class RespError(RuntimeError):
    """Server-side error reply (the '-ERR ...' line, verbatim)."""


class RespClient:
    """Minimal RESP2 client: encode commands as arrays of bulk strings,
    parse the five RESP2 reply types. One socket, request/response."""

    def __init__(self, host: str, port: int, db: int = 0,
                 timeout: float = 10.0):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._f = self._sock.makefile("rwb")
        if db:
            self.command("SELECT", str(db))

    @classmethod
    def from_url(cls, url: str, timeout: float = 10.0) -> "RespClient":
        """redis://host[:port][/db][?params] — parsed with urlsplit so
        query strings and bracketed IPv6 hosts survive (params beyond
        the db number need the real driver and are ignored here)."""
        from urllib.parse import urlsplit

        u = urlsplit(url if "://" in url else f"redis://{url}")
        db_seg = u.path.strip("/").split("/", 1)[0]
        return cls(u.hostname or "localhost", u.port or 6379,
                   int(db_seg) if db_seg.isdigit() else 0, timeout)

    def close(self) -> None:
        try:
            self._f.close()
        finally:
            self._sock.close()

    def command(self, *args):
        """Send one command, return the parsed reply (bytes for bulk
        strings, int, list, None for null bulk; RespError raised on '-')."""
        out = b"*%d\r\n" % len(args)
        for a in args:
            if isinstance(a, str):
                a = a.encode()
            out += b"$%d\r\n%s\r\n" % (len(a), a)
        self._f.write(out)
        self._f.flush()
        return self._read_reply()

    def _read_line(self) -> bytes:
        line = self._f.readline()
        if not line.endswith(b"\r\n"):
            raise ConnectionError("RESP: truncated reply line")
        return line[:-2]

    def _read_reply(self):
        line = self._read_line()
        t, rest = line[:1], line[1:]
        if t == b"+":
            return rest
        if t == b"-":
            raise RespError(rest.decode(errors="replace"))
        if t == b":":
            return int(rest)
        if t == b"$":
            n = int(rest)
            if n == -1:
                return None
            body = self._f.read(n + 2)
            if len(body) != n + 2 or body[-2:] != b"\r\n":
                raise ConnectionError("RESP: truncated bulk string")
            return body[:-2]
        if t == b"*":
            n = int(rest)
            if n == -1:
                return None
            return [self._read_reply() for _ in range(n)]
        raise ConnectionError(f"RESP: unknown reply type {t!r}")

    def scan_keys(self, pattern: str = "*", count: int = 1000):
        """Full SCAN cursor walk — the non-blocking iteration form (KEYS
        blocks the server on big keyspaces; SCAN is the production scan)."""
        cursor = b"0"
        while True:
            cursor, keys = self.command(
                "SCAN", cursor, "MATCH", pattern, "COUNT", str(count)
            )
            yield from keys
            if cursor == b"0":
                break

    def get(self, key) -> "bytes | None":
        return self.command("GET", key)

    def type(self, key) -> bytes:
        return self.command("TYPE", key)


# --------------------------------------------------------------------------
# BSON (subset: the types a tabular/JSON-ish collection round-trips)
# --------------------------------------------------------------------------


class BsonInt64(int):
    """Marker: force int64 encoding (cursor ids MUST be int64 on the
    wire even when they fit in 32 bits)."""


def bson_encode(doc: dict) -> bytes:
    body = b"".join(
        _bson_element(k, v) for k, v in doc.items()
    )
    return struct.pack("<i", len(body) + 5) + body + b"\x00"


def _bson_element(key: str, v) -> bytes:
    name = key.encode() + b"\x00"
    if isinstance(v, bool):  # before int: bool is an int subclass
        return b"\x08" + name + (b"\x01" if v else b"\x00")
    if isinstance(v, BsonInt64):
        return b"\x12" + name + struct.pack("<q", int(v))
    if isinstance(v, int):
        if -(2**31) <= v < 2**31:
            return b"\x10" + name + struct.pack("<i", v)
        return b"\x12" + name + struct.pack("<q", v)
    if isinstance(v, float):
        return b"\x01" + name + struct.pack("<d", v)
    if isinstance(v, str):
        s = v.encode()
        return b"\x02" + name + struct.pack("<i", len(s) + 1) + s + b"\x00"
    if v is None:
        return b"\x0a" + name
    if isinstance(v, dict):
        return b"\x03" + name + bson_encode(v)
    if isinstance(v, (list, tuple)):
        arr = {str(i): x for i, x in enumerate(v)}
        return b"\x04" + name + bson_encode(arr)
    if isinstance(v, (bytes, bytearray)):
        return (b"\x05" + name + struct.pack("<i", len(v)) + b"\x00"
                + bytes(v))
    raise TypeError(f"bson_encode: unsupported type {type(v).__name__}")


def bson_decode(buf: bytes, offset: int = 0) -> "tuple[dict, int]":
    """Decode one document starting at ``offset``; returns (doc, end)."""
    (doclen,) = struct.unpack_from("<i", buf, offset)
    end = offset + doclen
    if buf[end - 1] != 0:
        raise ValueError("BSON: document not NUL-terminated")
    pos = offset + 4
    doc: dict = {}
    while pos < end - 1:
        t = buf[pos]
        pos += 1
        zero = buf.index(b"\x00", pos)
        key = buf[pos:zero].decode()
        pos = zero + 1
        if t == 0x01:
            (doc[key],) = struct.unpack_from("<d", buf, pos)
            pos += 8
        elif t == 0x02:
            (n,) = struct.unpack_from("<i", buf, pos)
            doc[key] = buf[pos + 4 : pos + 4 + n - 1].decode()
            pos += 4 + n
        elif t == 0x03:
            doc[key], pos = bson_decode(buf, pos)
        elif t == 0x04:
            arr, pos = bson_decode(buf, pos)
            doc[key] = [arr[k] for k in sorted(arr, key=int)]
        elif t == 0x05:
            (n,) = struct.unpack_from("<i", buf, pos)
            doc[key] = bytes(buf[pos + 5 : pos + 5 + n])
            pos += 5 + n
        elif t == 0x07:  # ObjectId -> hex string (JSON-ish row value)
            doc[key] = buf[pos : pos + 12].hex()
            pos += 12
        elif t == 0x08:
            doc[key] = buf[pos] == 1
            pos += 1
        elif t == 0x09:  # UTC datetime: millis since epoch
            (ms,) = struct.unpack_from("<q", buf, pos)
            doc[key] = BsonInt64(ms)
            pos += 8
        elif t == 0x0A:
            doc[key] = None
        elif t == 0x10:
            (doc[key],) = struct.unpack_from("<i", buf, pos)
            pos += 4
        elif t == 0x12:
            (v,) = struct.unpack_from("<q", buf, pos)
            doc[key] = BsonInt64(v)
            pos += 8
        else:
            raise ValueError(f"BSON: unsupported element type 0x{t:02x}")
    return doc, end


# --------------------------------------------------------------------------
# MongoDB wire protocol (OP_MSG, opcode 2013, section kind 0)
# --------------------------------------------------------------------------

_OP_MSG = 2013


class MongoWireClient:
    """Minimal OP_MSG request/response client. Unauthenticated
    deployments only — SCRAM needs the real driver."""

    def __init__(self, host: str, port: int = 27017, timeout: float = 10.0):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._req_id = 0

    @classmethod
    def from_url(cls, url: str, timeout: float = 10.0) -> "MongoWireClient":
        """mongodb://host[:port][/...]"""
        rest = url.split("://", 1)[-1].split("@", 1)[-1]
        hostport = rest.split("/", 1)[0].split(",")[0]
        host, _, port = hostport.partition(":")
        return cls(host or "localhost", int(port or 27017), timeout)

    def close(self) -> None:
        self._sock.close()

    def _recv_exact(self, n: int) -> bytes:
        out = b""
        while len(out) < n:
            chunk = self._sock.recv(n - len(out))
            if not chunk:
                raise ConnectionError("OP_MSG: connection closed mid-reply")
            out += chunk
        return out

    def run_command(self, command: dict) -> dict:
        """One OP_MSG round trip; returns the reply body document and
        raises on ok != 1."""
        self._req_id += 1
        body = struct.pack("<I", 0) + b"\x00" + bson_encode(command)
        header = struct.pack(
            "<iiii", 16 + len(body), self._req_id, 0, _OP_MSG
        )
        self._sock.sendall(header + body)
        (msg_len,) = struct.unpack("<i", self._recv_exact(4))
        rest = self._recv_exact(msg_len - 4)
        _req, _resp_to, opcode = struct.unpack_from("<iii", rest, 0)
        if opcode != _OP_MSG:
            raise ConnectionError(f"OP_MSG: unexpected reply opcode {opcode}")
        # flagBits(4) then sections; kind 0 is a single BSON doc
        (flags,) = struct.unpack_from("<I", rest, 12)
        if flags & 0x1:  # checksumPresent: a CRC32C trails the sections
            raise ConnectionError(
                "OP_MSG: checksummed replies unsupported (flag bit 0)"
            )
        if rest[16] != 0:
            raise ConnectionError("OP_MSG: expected section kind 0")
        doc, _ = bson_decode(rest, 17)
        if doc.get("ok") not in (1, 1.0, True):
            raise RuntimeError(f"mongo command failed: {doc}")
        return doc

    def find(self, db: str, collection: str, filter: "dict | None" = None,
             batch_size: int = 1000, max_rows: int = 1_000_000):
        """find + getMore cursor walk; yields documents."""
        cmd: dict = {"find": collection, "$db": db,
                     "batchSize": batch_size}
        if filter:
            cmd["filter"] = filter
        reply = self.run_command(cmd)
        cursor = reply["cursor"]
        n = 0
        batch = cursor.get("firstBatch", [])
        while True:
            for d in batch:
                yield d
                n += 1
                if n >= max_rows:
                    return
            cid = int(cursor.get("id", 0))
            if cid == 0:
                return
            reply = self.run_command({
                "getMore": BsonInt64(cid),
                "collection": collection,
                "$db": db,
                "batchSize": batch_size,
            })
            cursor = reply["cursor"]
            batch = cursor.get("nextBatch", [])


# --------------------------------------------------------------------------
# MQTT 3.1.1 (OASIS standard; CONNECT/SUBSCRIBE/PUBLISH framing)
# --------------------------------------------------------------------------


def _mqtt_varint(n: int) -> bytes:
    """MQTT remaining-length: 7 bits per byte, MSB = continuation."""
    out = bytearray()
    while True:
        b = n % 128
        n //= 128
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


class MqttWireClient:
    """Minimal MQTT 3.1.1 subscriber: CONNECT/CONNACK handshake,
    SUBSCRIBE at QoS 0/1, PUBLISH receive (PUBACK sent for QoS 1),
    PINGRESP tolerated. Unauthenticated brokers; TLS/AUTH need the
    real client."""

    def __init__(self, host: str, port: int = 1883,
                 client_id: str = "intake-spark",
                 keepalive: int = 60, timeout: float = 10.0):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._buf = b""
        self._pkt_id = 0
        self._pending: list = []  # PUBLISHes that beat the SUBACK
        cid = client_id.encode()
        var = (b"\x00\x04MQTT\x04\x02" + struct.pack(">H", keepalive)
               + struct.pack(">H", len(cid)) + cid)
        self._sock.sendall(b"\x10" + _mqtt_varint(len(var)) + var)
        ptype, body = self._read_packet()
        if ptype != 0x20 or len(body) != 2 or body[1] != 0:
            raise ConnectionError(
                f"MQTT CONNACK refused (type 0x{ptype:02x}, body {body!r})"
            )

    @classmethod
    def from_url(cls, url: str, **kw) -> "MqttWireClient":
        addr = url.split("://", 1)[-1]
        host, _, port = addr.partition(":")
        return cls(host or "localhost", int(port or 1883), **kw)

    def close(self) -> None:
        try:
            self._sock.sendall(b"\xe0\x00")  # DISCONNECT
        except OSError:
            pass
        self._sock.close()

    def _recv(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self._sock.recv(4096)
            if not chunk:
                raise ConnectionError("MQTT: connection closed")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _read_packet(self) -> "tuple[int, bytes]":
        h = self._recv(1)[0]
        length, shift = 0, 0
        while True:
            b = self._recv(1)[0]
            length |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
            if shift > 21:
                raise ConnectionError("MQTT: malformed remaining length")
        return h, self._recv(length)

    def subscribe(self, topic: str, qos: int = 0) -> None:
        self._pkt_id += 1
        t = topic.encode()
        var = (struct.pack(">H", self._pkt_id)
               + struct.pack(">H", len(t)) + t + bytes([qos]))
        self._sock.sendall(b"\x82" + _mqtt_varint(len(var)) + var)
        while True:
            ptype, body = self._read_packet()
            if ptype == 0x90:  # SUBACK
                if body[:2] != struct.pack(">H", self._pkt_id):
                    raise ConnectionError("MQTT SUBACK packet-id mismatch")
                if body[2] & 0x80:
                    raise ConnectionError("MQTT subscription rejected")
                return
            if ptype == 0xD0:  # PINGRESP — ignore
                continue
            if ptype & 0xF0 == 0x30:
                # MQTT 3.1.1 §3.8.4: the server MAY start delivering
                # matching PUBLISHes before the SUBACK (retained
                # messages typically arrive here) — buffer, don't fail
                self._pending.append(self._parse_publish(ptype, body))
                continue
            raise ConnectionError(f"MQTT: expected SUBACK, got 0x{ptype:02x}")

    def _parse_publish(self, ptype: int, body: bytes) -> "tuple[str, bytes]":
        qos = (ptype >> 1) & 0x3
        (tlen,) = struct.unpack_from(">H", body, 0)
        topic = body[2 : 2 + tlen].decode()
        pos = 2 + tlen
        if qos:
            (pid,) = struct.unpack_from(">H", body, pos)
            pos += 2
            # acknowledge QoS 1 (QoS 2's PUBREC/PUBREL dance is out
            # of scope for a batch peek)
            self._sock.sendall(b"\x40\x02" + struct.pack(">H", pid))
        return topic, body[pos:]

    def messages(self, n: int, timeout_s: float = 30.0):
        """Yield up to ``n`` (topic, payload bytes) PUBLISH messages;
        ``timeout_s`` is a HARD deadline for the whole batch, so a
        slow-but-steady topic still returns a partial result on time."""
        import time

        deadline = time.monotonic() + timeout_s
        got = 0
        while self._pending and got < n:
            yield self._pending.pop(0)
            got += 1
        while got < n and time.monotonic() < deadline:
            self._sock.settimeout(max(0.05, deadline - time.monotonic()))
            try:
                ptype, body = self._read_packet()
            except (TimeoutError, socket.timeout):
                return
            if ptype & 0xF0 != 0x30:
                if ptype == 0xD0:  # PINGRESP
                    continue
                raise ConnectionError(
                    f"MQTT: unexpected packet 0x{ptype:02x} mid-stream"
                )
            yield self._parse_publish(ptype, body)
            got += 1
