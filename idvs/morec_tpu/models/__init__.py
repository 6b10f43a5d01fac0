from .layers import MLPLayers, FCLayers, AddFusion, CatFusion, xavier_normal, zeros_init
from .sasrec import SASRecEncoder
from .dssm import MLPEncoder
from .model import RecModel, make_model
