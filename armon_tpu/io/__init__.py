from .output import (
    write_state_file, read_state_file, read_reference_csv,
    compare_states, count_differences, saved_vars_arrays,
)
