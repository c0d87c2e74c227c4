-- Outbox bootstrap for the live-PostgreSQL parity harness.
--
-- Re-expresses (original DDL) the reference's change-capture contract
-- (01-change-tracking-setup.postgres.sql semantics): a tracked table, an
-- outbox whose BIGSERIAL id is the version the engine watermarks, an
-- xact_id column (pg_current_xact_id) that the commit-horizon predicate
-- compares against pg_snapshot_xmin(pg_current_snapshot()), and a trigger
-- that writes one outbox row per I/U/D with the changed-column list.
--
-- Requires PostgreSQL 13+ (pg_current_xact_id / pg_snapshot_xmin).

CREATE TABLE IF NOT EXISTS items
(
    pk       BIGINT GENERATED ALWAYS AS IDENTITY PRIMARY KEY,
    label    TEXT             NOT NULL,
    qty      INT              NOT NULL DEFAULT 0,
    price    NUMERIC(12, 2)   NOT NULL DEFAULT 0,
    note     TEXT
);

CREATE TABLE IF NOT EXISTS items_outbox
(
    id        BIGINT GENERATED ALWAYS AS IDENTITY PRIMARY KEY,
    xact_id   BIGINT  NOT NULL DEFAULT pg_current_xact_id()::text::bigint,
    operation CHAR(1) NOT NULL,          -- I / U / D
    pk        BIGINT  NOT NULL,
    changed   TEXT[]  NOT NULL DEFAULT '{}',
    label     TEXT,
    qty       INT,
    price     NUMERIC(12, 2),
    note      TEXT
);

CREATE INDEX IF NOT EXISTS items_outbox_id_idx ON items_outbox (id);

CREATE OR REPLACE FUNCTION items_capture() RETURNS trigger AS
$$
DECLARE
    cols TEXT[] := '{}';
BEGIN
    IF TG_OP = 'INSERT' THEN
        INSERT INTO items_outbox (operation, pk, changed, label, qty, price, note)
        VALUES ('I', NEW.pk, '{}', NEW.label, NEW.qty, NEW.price, NEW.note);
        RETURN NEW;
    ELSIF TG_OP = 'UPDATE' THEN
        IF NEW.label IS DISTINCT FROM OLD.label THEN cols := array_append(cols, 'label'); END IF;
        IF NEW.qty   IS DISTINCT FROM OLD.qty   THEN cols := array_append(cols, 'qty');   END IF;
        IF NEW.price IS DISTINCT FROM OLD.price THEN cols := array_append(cols, 'price'); END IF;
        IF NEW.note  IS DISTINCT FROM OLD.note  THEN cols := array_append(cols, 'note');  END IF;
        IF cols = '{}' THEN RETURN NEW; END IF;  -- no-op update: no row
        INSERT INTO items_outbox (operation, pk, changed, label, qty, price, note)
        VALUES ('U', NEW.pk, cols, NEW.label, NEW.qty, NEW.price, NEW.note);
        RETURN NEW;
    ELSE
        INSERT INTO items_outbox (operation, pk, changed)
        VALUES ('D', OLD.pk, '{}');
        RETURN OLD;
    END IF;
END;
$$ LANGUAGE plpgsql;

DROP TRIGGER IF EXISTS items_capture_trg ON items;
CREATE TRIGGER items_capture_trg
    AFTER INSERT OR UPDATE OR DELETE ON items
    FOR EACH ROW EXECUTE FUNCTION items_capture();

-- seed data (versions 1..N in the outbox via the trigger)
INSERT INTO items (label, qty, price, note)
SELECT 'item-' || g, g % 7, (g % 100) + 0.5, CASE WHEN g % 3 = 0 THEN 'n' || g END
FROM generate_series(1, 200) AS g;

UPDATE items SET qty = qty + 1 WHERE pk % 5 = 0;
DELETE FROM items WHERE pk % 41 = 0;
