from .validate import AverageMeter, ValidateHelper, accuracy_sums
from .train import TrainHelper
