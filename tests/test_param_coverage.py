"""Every MappingParams field is accounted for: wired to behavior, a
structural non-issue on this architecture, or reference-dead — no silent
no-ops (VERDICT round-1 item 2).

Adding a field without classifying it here fails the test, so new knobs
cannot regress into silently-parsed state.
"""

import dataclasses

from blasr_tpu.params import MappingParams

# Fields that change observable behavior, with the module that reads them.
WIRED = {
    "match": "params.default_score_matrix",
    "mismatch": "params.default_score_matrix",
    "insertion": "map_read.Mapper gap costs",
    "deletion": "map_read.Mapper gap costs",
    "indel": "kernels/sw + extend",
    "affine_align": "map_read.Mapper gap costs",
    "affine_open": "map_read.Mapper gap costs + onegap",
    "affine_extend": "map_read.Mapper gap costs",
    "score_matrix": "map_read.Mapper submat",
    "max_score": "select.prune_alignments + satisfies_filters",
    "use_score_cutoff": "select.satisfies_filters",
    "min_match_length": "map_batch min_match",
    "max_match_length": "map_batch max_lcp",
    "max_anchors_per_position": "map_batch",
    "advance_exact_matches": "kernels/anchor advance_exact",
    "expand": "internal: current level of the expand loop",
    "max_expand": "Mapper.map_reads retry loop",
    "min_expand": "Mapper.map_reads initial pass level",
    "lookup_table_length": "make_sane min_match clamp + index k",
    "n_candidates": "Mapper cfg + prune + ScaleMapQVByClusterSize",
    "indel_rate": "map_batch window sizing",
    "p_value_type": "kernels/chain weightor selection",
    "fast_max_interval": "Mapper._chain_lookback",
    "aggressive_interval_cut": "map_batch candidate cut",
    "advance_half": "Mapper._chain_lookback",
    "min_interval_weight": "map_batch significance gate",
    "sdp_tuple_size": "map_batch k_sdp + prune_alignments",
    "fast_sdp": "map_batch sdp_occ",
    "sdp_bypass_threshold": "map_batch SDP-guide bypass",
    "refine_between_anchors_only": "map_batch between_only",
    "extend_alignments": "pipeline/extend",
    "extend_band_size": "pipeline/extend",
    "max_extend_dropoff": "pipeline/extend",
    "n_best": "select.select_alignments",
    "min_aln_length": "select.satisfies_filters",
    "min_pct_similarity": "select.satisfies_filters + overlap prune",
    "min_pct_accuracy": "select.satisfies_filters",
    "hit_policy": "select.select_alignments",
    "random_seed": "select RNG",
    "min_read_length": "Mapper.map_reads",
    "max_read_length": "Mapper.map_reads",
    "min_subread_length": "cli HDF extraction",
    "min_raw_subread_score": "cli HDF extraction (HQ-region score gate)",
    "min_avg_qual": "cli read-intake average-quality gate",
    "place_randomly": "make_sane: forces randombest hit policy",
    "use_region_table": "cli HDF extraction (--ignoreRegions)",
    "use_hq_region_table": "cli HDF extraction (--ignoreHQRegions)",
    "accuracy_prior": "select.num_significant_clusters p_acc override",
    "candidate_drift_penalty": "map_batch cand_drift -> kernels.chain "
                               "drift_penalty (candidate ranking; the "
                               "rescue deep pass defaults it to 1.0)",
    "full_span_mapqv": "Mapper.map_reads ambiguity-rescue merge (keeps "
                       "the deep pass's full-span competitors for the "
                       "mapQV partition; --fullSpanMapQV)",
    "sam_qv_list": "io/formats samQV tag subset",
    "min_fraction_to_be_considered_overlapping": "select partition",
    "store_map_qv": "cli emit (--noStoreMapQV)",
    "scale_mapqv_by_num_significant_clusters": "select",
    "substitution_prior": "pipeline/scoring IDS",
    "global_deletion_prior": "pipeline/scoring IDS",
    "read_accuracy_prior": "pipeline/scoring",
    "ignore_qualities": "map_batch use_qv (QV-steered DP) + select rescoring",
    "score_type": "map_batch qv_score_type (sumQVScore reporting)",
    "forward_only": "Mapper._collect_batch",
    "map_subreads_separately": "cli HDF extraction",
    "concordant": "pipeline/zmw",
    "concordant_template": "pipeline/zmw",
    "flank_size": "pipeline/zmw",
    "use_ccs": "cli + zmw",
    "use_ccs_only": "cli + zmw",
    "use_all_subreads_in_ccs": "cli + zmw",
    "print_format": "cli emit",
    "clipping": "io/formats",
    "print_sam_qv": "io/formats QV tags",
    "cigar_use_seq_match": "map_read split_match_runs",
    "allow_adjacent_indels": "map_read CIGAR merge",
    "print_only_best": "select.select_alignments",
    "print_unaligned": "cli emit",
    "print_unaligned_names_only": "cli emit",
    "print_header": "cli emit",
    "preserve_read_title": "io/formats",
    "print_subread_title": "io/formats",
    "title_table_name": "cli emit",
    "start_read": "cli sharding",
    "stride": "cli sharding",
    "subsample": "cli subsampling",
    "hole_number_ranges": "cli filtering",
    "verbosity": "interval prints",
    "emulate_nucmer": "make_sane preset",
    "do_sensitive_search": "Mapper.map_reads sensitive re-run",
    "global_chain_type": "kernels/chain restricted-global-chain transitions",
}

# Structural on this architecture: the behavior the flag selects in the
# reference is either the only formulation here or fused away; the
# defaults match reference behavior, and the CLI rejects/warns on
# requests for the unsupported alternative where one exists.
STRUCTURAL = {
    "do_global_alignment": "window spans widen to the read ends "
                           "unconditionally here (commit 93a895a)",
    "warp": "warp only speeds the reference's CPU window advance; the "
            "chain DP is exhaustive either way, so --nowarp is a no-op",
    "refine_alignments": "refinement is fused into the banded DP",
    "use_guided_align": "the guided band path is the aligner itself",
    "guided_align_band_size": "band is the 128-lane hardware width",
    "band_size": "band is the 128-lane hardware width",
    "detailed_sdp_alignment": "banded DP over the SDP guide is the "
                              "between-fragment refinement (always on)",
    "recurse_over": "kernels are iterative; no recursion to bound",
    "sdp_indel": "SDP guide has no gap scoring; the main DP prices gaps",
    "sdp_ins": "same",
    "sdp_del": "same",
    "nproc": "device batching replaces the pthread pool",
    "use_random_seed": "seed is always explicit (default 0, "
                       "deterministic); the reference seeds from time "
                       "when the flag is absent",
    "refine_concordant_alignments": "concordant remap runs the full "
                                    "banded DP — refinement built in",
    "concordant_align_both_directions": "the window remap always "
                                        "searches both strands (the "
                                        "flag's ON behavior)",
}

# Parsed but never read by the reference itself (parity by acceptance).
REFERENCE_DEAD = {
    "min_ratio": "set at MappingParameters.h:213, read nowhere",
    "max_lis_p_value": "IntervalSearchParameters.maxPValue is a "
                       "hardcoded constant in the reference driver",
}


def test_every_param_field_classified():
    fields = {f.name for f in dataclasses.fields(MappingParams)}
    classified = set(WIRED) | set(STRUCTURAL) | set(REFERENCE_DEAD)
    unclassified = fields - classified
    stale = classified - fields
    assert not unclassified, f"unclassified MappingParams fields: {unclassified}"
    assert not stale, f"classified but nonexistent fields: {stale}"
    overlap = (set(WIRED) & set(STRUCTURAL)) | (set(WIRED) & set(
        REFERENCE_DEAD)) | (set(STRUCTURAL) & set(REFERENCE_DEAD))
    assert not overlap, overlap


def test_wired_fields_are_actually_read():
    """Spot-check: every WIRED field name appears outside params.py
    (structural/dead ones are exempt)."""
    import pathlib
    import re
    root = pathlib.Path(__file__).resolve().parent.parent / "blasr_tpu"
    text = "\n".join(p.read_text() for p in root.rglob("*.py")
                     if p.name != "params.py")
    # fields consumed at the CLI argument level or inside make_sane
    # rather than via a params attribute read elsewhere
    exempt = {"expand", "lookup_table_length", "emulate_nucmer",
              "map_subreads_separately", "print_unaligned",
              "place_randomly"}
    missing = [f for f in WIRED
               if not re.search(rf"\.{f}\b|\"{f}\"", text)
               and f not in exempt]
    assert not missing, f"WIRED fields never read outside params.py: {missing}"
