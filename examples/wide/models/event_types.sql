CREATE TABLE event_types AS SELECT event_type, COUNT(*) AS n, AVG(value) AS v FROM events GROUP BY event_type
