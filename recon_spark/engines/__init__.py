from . import age_taxcode, ira_rollover, match_planid, roth_taxable  # noqa: F401
