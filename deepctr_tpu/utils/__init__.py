from . import metrics, serialization
