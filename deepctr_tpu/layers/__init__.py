from .activation import Dice, Identity, PReLU, activation_layer
from .core import DNN, PredictionLayer, LocalActivationUnit, Conv2dSame
from .interaction import (FM, BiInteractionPooling, SENETLayer,
                          BilinearInteraction, CIN, AFMLayer,
                          InteractingLayer, CrossNet, CrossNetMix,
                          InnerProductLayer, OutterProductLayer, ConvLayer,
                          LogTransformLayer)
from .sequence import (SequencePoolingLayer, AttentionSequencePoolingLayer,
                       KMaxPooling, AGRUCell, AUGRUCell, DynamicGRU,
                       MaskedGRU)
from .utils import concat_fun, slice_arrays
