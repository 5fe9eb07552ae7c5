from . import caffe_pb, caffemodel, prototxt, wire  # noqa: F401
from .caffe_pb import SCHEMA, View, view  # noqa: F401
