"""Mechanical schema parity: every message in the SCHEMA registry is
compared field-by-field (number, label, wire type, default) against the
reference's own ``src/caffe/proto/caffe.proto``, by compiling BOTH to
FileDescriptorSets with protoc.  A wrong field number / type / default in
proto/caffe_pb.py — which would silently corrupt .caffemodel or prototxt
interop — cannot hide from this.
"""

import os
import shutil
import subprocess

import pytest

if shutil.which("protoc") is None:
    pytest.skip("protoc not available", allow_module_level=True)
pytest.importorskip("google.protobuf")

REF_PROTO = "/root/reference/src/caffe/proto/caffe.proto"

# reference fields intentionally not carried in the registry (if any) —
# empty today; add (message, field_name) tuples with a reason if ever
# needed
KNOWN_ABSENT = set()

_TYPE = {}  # FieldDescriptorProto.Type value -> name


def _descriptor_set(proto_path, tmp):
    from google.protobuf import descriptor_pb2

    out = os.path.join(tmp, os.path.basename(proto_path) + ".ds")
    subprocess.run(["protoc", f"--descriptor_set_out={out}",
                    "-I", os.path.dirname(proto_path),
                    os.path.basename(proto_path)],
                   check=True, capture_output=True)
    ds = descriptor_pb2.FileDescriptorSet()
    ds.ParseFromString(open(out, "rb").read())
    assert len(ds.file) == 1
    return ds.file[0]


def _field_facts(fdp):
    """{message: {number: (name, label, type, default)}} with enum types
    collapsed (type names differ by design — enums are nested per use)."""
    from google.protobuf import descriptor_pb2

    T = descriptor_pb2.FieldDescriptorProto
    out = {}
    for msg in fdp.message_type:
        fields = {}
        for f in msg.field:
            t = T.Type.Name(f.type)
            if t == "TYPE_GROUP":
                continue  # V0 'layer' group handled as message both sides
            if t == "TYPE_MESSAGE":
                tname = f.type_name.rsplit(".", 1)[-1]
            elif t == "TYPE_ENUM":
                tname = "<enum>"
            else:
                tname = t
            lbl = T.Label.Name(f.label)
            if lbl == "LABEL_REQUIRED":
                lbl = "LABEL_OPTIONAL"  # registry treats required as optional
            fields[f.number] = (f.name, lbl, tname, f.default_value)
        out[msg.name] = fields
    return out


def test_schema_registry_matches_reference_proto(tmp_path):
    if not os.path.exists(REF_PROTO):
        pytest.skip("reference not mounted")
    from caffe_rtpose_tpu.proto.gen_proto import generate_proto

    ours_proto = tmp_path / "caffe_rtpose.proto"
    ours_proto.write_text(generate_proto())
    ours = _field_facts(_descriptor_set(str(ours_proto), str(tmp_path)))
    ref = _field_facts(_descriptor_set(REF_PROTO, str(tmp_path)))

    problems = []
    for msg, ref_fields in ref.items():
        if msg not in ours:
            problems.append(f"message {msg} missing")
            continue
        our_fields = ours[msg]
        for num, (name, lbl, tname, dflt) in ref_fields.items():
            if (msg, name) in KNOWN_ABSENT:
                continue
            got = our_fields.get(num)
            if got is None:
                problems.append(f"{msg}.{name} (field {num}) missing")
            elif got[0] != name or got[1] != lbl or got[2] != tname:
                problems.append(
                    f"{msg}.{name} (field {num}): ours {got[:3]} vs "
                    f"reference {(name, lbl, tname)}")
            elif got[3] != dflt and not _defaults_equal(got[3], dflt):
                problems.append(
                    f"{msg}.{name} default: ours {got[3]!r} vs "
                    f"reference {dflt!r}")
        # and no phantom fields the reference doesn't have
        for num, got in our_fields.items():
            if num not in ref_fields:
                problems.append(f"{msg}.{got[0]} (field {num}) not in "
                                "reference")
    assert not problems, "\n".join(problems)


def _defaults_equal(a: str, b: str) -> bool:
    """'1' vs '1.0' / '1e-08' vs '1e-8' spellings."""
    try:
        return float(a or 0) == float(b or 0)
    except ValueError:
        return False
