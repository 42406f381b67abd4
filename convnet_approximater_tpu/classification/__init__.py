from .validate import AverageMeter, ValidateHelper, accuracy_sums
