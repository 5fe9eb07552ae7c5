from . import caffe_pb, caffemodel, prototxt, wire  # noqa: F401
from .caffe_pb import SCHEMA, View, view  # noqa: F401


def __getattr__(name):
    # `caffe.proto.caffe_pb2` pycaffe parity, loaded lazily because the
    # first import generates + protoc-compiles the schema (gen_proto.py)
    if name == "caffe_pb2":
        import importlib

        return importlib.import_module(".caffe_pb2", __name__)
    raise AttributeError(name)
