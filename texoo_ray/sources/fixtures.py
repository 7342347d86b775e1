"""Fixture word banks and gazetteer terms for the deterministic generator.

Derived from FIXTURES.md §1/§3 (which in turn derives from the reference's
unit-test fixtures). No external data.
"""

WORD_BANK = (
    "the quick brown fox jumps over a lazy dog while many small rivers flow "
    "through green valleys and tall mountains rise above quiet villages where "
    "people gather every morning to trade fresh goods books ideas stories and "
    "songs about history science weather travel medicine music art finance "
    "engineering farming cooking sports law language memory networks data "
    "systems models pipelines clusters shards tokens spans documents sections"
).split()

ABBREV_SAMPLES = ["Dr.", "e.g.", "etc.", "i.e.", "Prof.", "vs.", "No."]

ENTITY_TERMS = [
    "New York City", "United Nations", "Albert Einstein", "Marie Curie",
    "World Health Organization", "European Union", "Mount Everest",
    "Pacific Ocean", "Amazon River", "Isaac Newton", "Leonardo da Vinci",
    "San Francisco", "Tokyo", "Berlin", "Paris", "London", "Cairo",
    "UPS", "ECG", "NASA", "UNESCO", "DNA", "HTTP", "SQL",
    "Monty Python", "Sue Jones-Davies", "Vladimir Hachinski",
    "Beuth Hochschule", "Alexander Löser", "Friedrich Schiller",
    "Thomas Martin Lowry", "West Yorkshire", "Low Moor",
    "Hurricane Center", "Freedom House", "Tanzania", "Geneva",
    "Volkswagen Caddy", "Caddy Life", "immune system", "tumor cells",
    "cancer", "molecules", "immunotherapy", "aspirin", "dementia",
]

# Extra short / stopword terms that exercise convertTerms filters
GAZETTEER_TERMS = ENTITY_TERMS + ["ab", "e", "the", "and", "of"]

DE_SENTENCES = [
    "Der Professor arbeitet an der Hochschule für Technik in Berlin.",
    "Die Kraniche des Ibykus ist eine Ballade von Friedrich Schiller.",
    "Das Modell wurde mit vielen Daten über Jahre trainiert.",
    "Eine Übersicht über die Ergebnisse findet sich im Anhang.",
]

MARKUP_SNIPPETS = [
    "<p>This paragraph has <b>bold</b> markup.</p>",
    '<div class="note">A note with &nbsp; entities &amp; symbols.</div>',
    "***LIST*** item one follows here.",
    "========,2,Introduction.",
    "***formula*** appears mid text.",
    "<span>inline</span> tail text.",
]

TOOL_NAMES = ["search", "calculator", "browser", "python", "sql", "shell"]
ROLES = ["user", "assistant", "system", "tool"]
