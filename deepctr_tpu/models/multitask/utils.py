"""Shared validation for multi-task models.
(reference parity: e.g. deepctr_torch/models/multitask/sharedbottom.py:46-57)
"""


def validate_tasks(task_types, task_names, dnn_feature_columns,
                   exactly_two=False, binary_only=False):
    num_tasks = len(task_names)
    if exactly_two:
        if num_tasks != 2:
            raise ValueError("the length of task_names must be equal to 2")
    elif num_tasks <= 1:
        raise ValueError("num_tasks must be greater than 1")
    if len(dnn_feature_columns) == 0:
        raise ValueError("dnn_feature_columns is null!")
    if len(task_types) != num_tasks:
        raise ValueError("num_tasks must be equal to the length of "
                         "task_types")
    for task_type in task_types:
        if binary_only:
            if task_type != "binary":
                raise ValueError("task must be binary in ESMM, {} is "
                                 "illegal".format(task_type))
        elif task_type not in ["binary", "regression"]:
            raise ValueError("task must be binary or regression, {} is "
                             "illegal".format(task_type))
    return num_tasks
