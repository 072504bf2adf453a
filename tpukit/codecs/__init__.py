"""In-framework codecs with a uniform encode/decode API."""
from tpukit.codecs.base import Codec, CodecResult, RateSpec
from tpukit.codecs.registry import create, names
