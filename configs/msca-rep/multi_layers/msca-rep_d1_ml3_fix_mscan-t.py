_base_ = ["../each_layer/msca-rep_d1_l1_fix_class-t.py"]

filters = [dict(type="IndicesFilter", indices=tuple(range(1, 3 + 1)))]
