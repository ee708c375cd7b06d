"""Protobuf source tests (ProtobufToIon analog): descriptor-set built
programmatically (no protoc in this environment), length-delimited framing,
unknown-field policy, schema evolution (the reference's v1.0/v1.1 fixture
pattern, /root/reference src/test/resources/protobuf)."""

import pytest

pytest.importorskip("google.protobuf")

from google.protobuf import descriptor_pb2

from plugin_serdes_ray.sources.protobuf_ import (
    parse_protobuf_bytes, serialize_protobuf,
)


def _descriptor_set(with_extra_field: bool = False) -> bytes:
    fds = descriptor_pb2.FileDescriptorSet()
    f = fds.file.add()
    f.name = "test.proto"
    f.package = "t"
    f.syntax = "proto3"
    m = f.message_type.add()
    m.name = "Item"
    for i, (name, typ) in enumerate([
        ("id", descriptor_pb2.FieldDescriptorProto.TYPE_INT64),
        ("name", descriptor_pb2.FieldDescriptorProto.TYPE_STRING),
        ("score", descriptor_pb2.FieldDescriptorProto.TYPE_DOUBLE),
    ], start=1):
        fld = m.field.add()
        fld.name = name
        fld.number = i
        fld.type = typ
        fld.label = descriptor_pb2.FieldDescriptorProto.LABEL_OPTIONAL
    if with_extra_field:
        fld = m.field.add()
        fld.name = "added_field"
        fld.number = 4
        fld.type = descriptor_pb2.FieldDescriptorProto.TYPE_STRING
        fld.label = descriptor_pb2.FieldDescriptorProto.LABEL_OPTIONAL
    return fds.SerializeToString()


RECORDS = [{"id": "1", "name": "a", "score": 1.5},
           {"id": "2", "name": "b", "score": -2.0}]


def test_protobuf_roundtrip_length_delimited():
    ds_bytes = _descriptor_set()
    blob = serialize_protobuf(RECORDS, ds_bytes, "t.Item")
    out = parse_protobuf_bytes(blob, ds_bytes, "t.Item")
    assert out == RECORDS


def test_protobuf_single_message():
    ds_bytes = _descriptor_set()
    blob = serialize_protobuf(RECORDS[:1], ds_bytes, "t.Item",
                              length_delimited=False)
    out = parse_protobuf_bytes(blob, ds_bytes, "t.Item",
                               length_delimited=False)
    assert out == RECORDS[:1]


def test_protobuf_schema_evolution_unknown_fields():
    """v1.1 writer (extra field) -> v1.0 reader: tolerated by default,
    rejected with error_on_unknown_fields (ProtobufToIon.java:196-200)."""
    v11 = _descriptor_set(with_extra_field=True)
    v10 = _descriptor_set(with_extra_field=False)
    rows = [{"id": "7", "name": "x", "score": 0.5, "added_field": "new"}]
    blob = serialize_protobuf(rows, v11, "t.Item")
    out = parse_protobuf_bytes(blob, v10, "t.Item")
    assert out == [{"id": "7", "name": "x", "score": 0.5}]
    out = parse_protobuf_bytes(blob, v10, "t.Item",
                               error_on_unknown_fields=True,
                               on_bad_lines="SKIP")
    assert out == []
    from plugin_serdes_ray.functions.errors import BadLineError
    with pytest.raises(BadLineError):
        parse_protobuf_bytes(blob, v10, "t.Item",
                             error_on_unknown_fields=True,
                             on_bad_lines="ERROR")
