"""Abbreviation and spacing-rule word sets.

Mirrors the reference's static word lists (WordHelpers.java:27-50 in
/root/reference/texoo-core/src/main/java/de/datexis/common/), which are in
turn taken from the public statmt.org europarl tools. Tokens in these sets
are never split by the tokenizer and never end a sentence.
"""

from __future__ import annotations

# Tokens that attach to the previous word without a space when rebuilding
# rule-spaced text (WordHelpers.java:27).
SKIP_SPACE_BEFORE = frozenset(
    [",", ".", ":", ";", "?", "!", ")", "]", "'m", "'s", "'re", "'ve", "'d", "'ll", "n't"]
)

# Tokens after which no space is inserted (WordHelpers.java:28).
SKIP_SPACE_AFTER = frozenset(["(", "[", "", "\n"])

ABBREVIATIONS_EN = frozenset(
    """Adj. Adm. Adv. Asst. Bart. Bldg. Brig. Bros. Capt. Cmdr. Col. Comdr. Con.
    Corp. Cpl. DR. Dr. Drs. Ens. Gen. Gov. Hon. Hr. Hosp. Insp. Lt. MM. MR. MRS.
    MS. Maj. Messrs. Mlle. Mme. Mr. Mrs. Ms. Msgr. Op. Ord. Pfc. Ph. Prof. Pvt.
    Rep. Reps. Res. Rev. Rt. Sen. Sens. Sfc. Sgt. Sr. St. Supt. Surg v. vs. i.e.
    rev. e.g. No. Nr. pp.""".split()
)

ABBREVIATIONS_DE = frozenset(
    """I. II. III. IV. V. VI. VII. VIII. IX. X. XI. XII. XIII. XIV. XV. XVI.
    XVII. XVIII. XIX. XX. i. ii. iii. iv. v. vi. vii. viii. ix. x. xi. xii.
    xiii. xiv. xv. xvi. xvii. xviii. xix. xx. Adj. Adm. Adv. Asst. Bart. Bldg.
    Brig. Bros. Capt. Cmdr. Col. Comdr. Con. Corp. Cpl. DR. Dr. Ens. Gen. Gov.
    Hon. Hosp. Insp. Lt. MM. MR. MRS. MS. Maj. Messrs. Mlle. Mme. Mr. Mrs. Ms.
    Msgr. Op. Ord. Pfc. Ph. Prof. Pvt. Rep. Reps. Res. Rev. Rt. Sen. Sens. Sfc.
    Sgt. Sr. St. Supt. Surg. Mio. Mrd. bzw. v. vs. usw. d.h. z.B. u.a. etc.
    MwSt. ggf. d.J. D.h. m.E. vgl. I.F. z.T. sogen. ff. u.E. g.U. g.g.A.
    c.-à-d. Buchst. u.s.w. sog. u.ä. Std. evtl. Zt. Chr. u.U. o.ä. Ltd. b.A.
    z.Zt. spp. sen. SA. k.o. jun. i.H.v. dgl. dergl. Co. zzt. usf. s.p.a. Dkr.
    bzgl. BSE. No. Nos. Art. Nr. pp. ca. Ca""".split()
)

# The reference consults both language lists for tokenization and for the
# sentence-boundary abbreviation guard regardless of document language
# (TokenizerMENL.java:152, SentenceDetectorMENL.java:211-215).
ABBREVIATIONS_ALL = ABBREVIATIONS_EN | ABBREVIATIONS_DE

# Distinct suffix lengths to probe when checking "does this text end with an
# abbreviation" (endswith semantics, SentenceDetectorMENL.java:211-215).
ABBREV_LENGTHS = tuple(sorted({len(a) for a in ABBREVIATIONS_ALL}))


def ends_with_abbreviation(text: str) -> bool:
    """True if ``text`` ends with any known abbreviation (either language)."""
    for n in ABBREV_LENGTHS:
        if len(text) >= n and text[-n:] in ABBREVIATIONS_ALL:
            return True
    return False


def ends_with_abbreviation_at(s: str, begin: int, end: int) -> bool:
    """``ends_with_abbreviation(s[begin:end])`` without slicing the whole
    sentence — probes only the suffix windows."""
    span = end - begin
    for n in ABBREV_LENGTHS:
        if span >= n and s[end - n : end] in ABBREVIATIONS_ALL:
            return True
    return False
