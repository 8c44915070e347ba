PREFIX ex: <http://ex/>
WITH ex:g2 INSERT { ?s ex:v9 ?n } USING ex:g1 WHERE { ?s ex:v ?n }
