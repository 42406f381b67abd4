from .approximater import APP, Approximater, build_app
from .low_rank_exp import (LowRankExpV1, LowRankExpV2, LowRankExpV3,
                           LowRankExpV4)
from .ffn_rep import FfnRep
from .ffn_prune import AttnPrune, FfnPrune, MlpPrune
from .msca_rep import MscaProfile, MscaRep, MscaRepProfile
from .dw_sep_rep import DwSepRep
from .dummy import Dummy
from . import low_rank_solvers
