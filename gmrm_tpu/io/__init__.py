from gmrm_tpu.io.bed import read_bed, write_bed, bed_bytes_per_marker
from gmrm_tpu.io.phen import Phenotype, read_phen
from gmrm_tpu.io.grouping import read_dim, read_group_index, read_group_mixtures
from gmrm_tpu.io.bim import read_bim_ids
from gmrm_tpu.io.writers import (
    HistoryWriter,
    read_history,
    write_csv_record,
    format_csv_record,
    format_mlma_line,
)
