from gaplac_tpu.data.grid import make_test_df, make_test_grid
from gaplac_tpu.data.io import complete_cases, df_output, load_tables, read_table
from gaplac_tpu.data.transforms import getrank, invnormaltransform
