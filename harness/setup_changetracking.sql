-- SQL Server change-tracking bootstrap for the live-MSSQL parity leg.
--
-- Re-expresses (original DDL) the reference's SQL Server setup semantics
-- (01-change-tracking-setup.sqlserver.sql): enable CHANGE_TRACKING on the
-- database and the tracked table (WITH TRACK_COLUMNS_UPDATED for the
-- changed-column mask), then seed mixed I/U/D so CHANGETABLE has history.
-- The engine's generated pushdown (sources/jdbc.incremental_query) reads
--   CHANGETABLE(CHANGES items, @from) LEFT OUTER JOIN items
-- so deletes survive (the base row is gone, the change row is not).
--
-- Apply once after the container is healthy:
--   docker compose exec mssql /opt/mssql-tools18/bin/sqlcmd -C -U sa \
--     -P 'Trignis!Harness1' -i /setup_changetracking.sql

IF DB_ID('trignis') IS NULL
    CREATE DATABASE trignis;
GO

IF NOT EXISTS (SELECT 1 FROM sys.change_tracking_databases
               WHERE database_id = DB_ID('trignis'))
    ALTER DATABASE trignis SET CHANGE_TRACKING = ON
        (CHANGE_RETENTION = 2 DAYS, AUTO_CLEANUP = ON);
GO

-- snapshot isolation: the reference requires it so the version probe and
-- the change scan observe one consistent snapshot
ALTER DATABASE trignis SET ALLOW_SNAPSHOT_ISOLATION ON;
GO

USE trignis;
GO

IF OBJECT_ID('dbo.items') IS NULL
BEGIN
    CREATE TABLE dbo.items
    (
        pk    BIGINT IDENTITY (1,1) PRIMARY KEY,
        label NVARCHAR(200)  NOT NULL,
        qty   INT            NOT NULL DEFAULT 0,
        price DECIMAL(12, 2) NOT NULL DEFAULT 0,
        note  NVARCHAR(200)  NULL
    );
END
GO

IF NOT EXISTS (SELECT 1 FROM sys.change_tracking_tables
               WHERE object_id = OBJECT_ID('dbo.items'))
    ALTER TABLE dbo.items ENABLE CHANGE_TRACKING
        WITH (TRACK_COLUMNS_UPDATED = ON);
GO

-- seed mixed history: 200 inserts, updates on every 5th row, deletes on
-- every 41st — same DML shape as the postgres leg so the two parity runs
-- exercise comparable change batches
SET NOCOUNT ON;
DECLARE @g INT = 1;
WHILE @g <= 200
BEGIN
    INSERT INTO dbo.items (label, qty, price, note)
    VALUES ('item-' + CAST(@g AS NVARCHAR(10)), @g % 7, (@g % 100) + 0.5,
            CASE WHEN @g % 3 = 0 THEN 'n' + CAST(@g AS NVARCHAR(10)) END);
    SET @g = @g + 1;
END
GO

UPDATE dbo.items SET qty = qty + 1 WHERE pk % 5 = 0;
DELETE FROM dbo.items WHERE pk % 41 = 0;
GO

SELECT CHANGE_TRACKING_CURRENT_VERSION() AS current_version;
GO
